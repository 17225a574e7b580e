"""Triple extraction: the engine's core operator (SURVEY.md §2.3, T1-T6).

Replaces the reference's per-chunk LLM call (``graph_extractor.py:205-377``)
with a deterministic, fully vectorized pipeline:

  documents(doc_id, spans)
    → explode_spans                  (array_sort by offset + posexplode)
    → extract_raw                    (iterator mapInArrow: gazetteer
                                      mention scan + adjacency-pattern triples;
                                      regexes compiled once per Python worker)
    → resolve_triples                (broadcast alias join ×2, T4 canonical
                                      predicate join, T5 direction flip,
                                      T3 confidence default, dedup)

Scale notes: the only Python is one Arrow-batched UDF over span text; every
dictionary is a broadcast join (alias dict ~300 rows, semantic map 21 rows,
direction table 9 rows); dedup is the single shuffle, keyed on
(doc_id, subj, pred, obj) — doc_id leading keeps hub entities from skewing it.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import gazetteer as G
from ..functions.text import SENTENCE_SPLIT_REGEX
from ..vocab import (
    ATTACK_CHAIN_PREDICATES,
    CONNECTION_PREDICATES,
    DIRECTION_SEMANTICS,
    SEMANTIC_RELATIONSHIP_MAP,
)

# --- compiled pattern cache (one per Python worker process) -----------------


def _trie_pattern(words) -> str:
    """Trie-structured regex over a word set: shared prefixes collapse into
    nested alternations, so the backtracking engine explores one branch per
    next-character instead of one per alternative (~4× faster than a flat
    longest-first alternation on this gazetteer; verified match-identical on
    14k synthetic texts). Leftmost-longest is preserved structurally: trie
    branches never share a first character and word-end markers serialize as
    greedy ``(?:...)?`` continuations, which prefer the longer match."""
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}

    def ser(node: dict) -> str:
        keys = [k for k in node if k != ""]
        has_end = "" in node
        alts = [re.escape(k) + ser(node[k]) for k in sorted(keys)]
        if not alts:
            return ""
        body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
        return "(?:" + body + ")?" if has_end else body

    return ser(trie)


@lru_cache(maxsize=1)
def _mention_regex() -> re.Pattern:
    return re.compile(_trie_pattern(G.surface_to_entity()))


@lru_cache(maxsize=1)
def _relation_regex() -> re.Pattern:
    # word-bounded trie alternation; matched surface -> raw predicate via map
    return re.compile(
        r"\b(?:" + _trie_pattern(s for s, _ in G.ALL_RELATION_SURFACES) + r")\b"
    )


@lru_cache(maxsize=1)
def _sentence_regex() -> re.Pattern:
    return re.compile(SENTENCE_SPLIT_REGEX)


@lru_cache(maxsize=1)
def _rel_map() -> dict[str, str]:
    return G.relation_surface_map()


def _extract_from_text(text: str) -> tuple[list[tuple[str, int]], list[tuple[str, str, str, int]]]:
    """(mentions, raw_triples) for one text blob.

    Mention rule: leftmost-longest non-overlapping gazetteer matches per
    sentence. Triple rule: for each *adjacent* mention pair, the inter-text
    must contain a relation surface (longest wins) → (subj_surface, raw_pred,
    obj_surface). Deterministic stand-in for the reference's LLM transform.
    """
    mentions: list[tuple[str, int]] = []
    triples: list[tuple[str, str, str, int]] = []
    if not text:
        return mentions, triples
    rel_map = _rel_map()
    m_re, r_re = _mention_regex(), _relation_regex()
    for sent_idx, sent in enumerate(_sentence_regex().split(text)):
        ms = list(m_re.finditer(sent))
        for m in ms:
            mentions.append((m.group(0), sent_idx))
        for a, b in zip(ms, ms[1:]):
            inter = sent[a.end() : b.start()]
            hit = r_re.search(inter)
            if hit:
                triples.append((a.group(0), rel_map[hit.group(0)], b.group(0), sent_idx))
    return mentions, triples


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_order", T.IntegerType(), False),
        T.StructField(
            "mentions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("surface", T.StringType(), False),
                        T.StructField("sent_idx", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField(
            "raw_triples",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("subj_surface", T.StringType(), False),
                        T.StructField("pred_raw", T.StringType(), False),
                        T.StructField("obj_surface", T.StringType(), False),
                        T.StructField("sent_idx", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


# --- span explode ------------------------------------------------------------


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, span_order, kind, text, media_ref, offset) — span order is the
    rank of ``offset`` within the doc (input_hint invariant), computed by
    sorting the array *before* posexplode: no window, no shuffle."""
    sorted_spans = F.expr(
        "array_sort(spans, (a, b) -> CASE WHEN a.offset < b.offset THEN -1 "
        "WHEN a.offset > b.offset THEN 1 ELSE 0 END)"
    )
    return (
        docs.select("doc_id", F.posexplode(sorted_spans).alias("span_order", "span"))
        .select(
            "doc_id",
            F.col("span_order").cast("int").alias("span_order"),
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )


def chunk_spans(spans: DataFrame, chunk_size: int = 4000, overlap: int = 200,
                truncate_at: int = 10000) -> DataFrame:
    """P9/P10 pre-extraction stage: truncate overlong text
    (graph_extractor.py:511-514) then split into overlapping boundary-aware
    chunks (:583-619). Short spans pass through untouched (common case: zero
    Python). Chunk order is kept in span_order's fractional analogue — the
    downstream triple set is order-insensitive, and overlap duplicates are
    removed by resolve_triples' dedup."""
    from ..functions.text import make_chunk_text_udf, truncate_col

    needs = spans.filter(
        (F.col("kind") == "text") & (F.length("text") > chunk_size)
    )
    short = spans.filter(
        (F.col("kind") != "text") | (F.length("text") <= chunk_size)
    )
    chunk_udf = make_chunk_text_udf(chunk_size, overlap)
    chunked = (
        needs.withColumn("text", truncate_col(F.col("text"), truncate_at))
        .withColumn("chunks", chunk_udf(F.col("text")))
        .select(
            "doc_id",
            "kind",
            "media_ref",
            "offset",
            F.posexplode("chunks").alias("chunk_idx", "chunk"),
            "span_order",
        )
        .select(
            "doc_id",
            (F.col("span_order") * 1000 + F.col("chunk_idx")).cast("int").alias("span_order"),
            "kind",
            F.col("chunk").alias("text"),
            "media_ref",
            "offset",
        )
    )
    return short.unionByName(chunked)


# --- raw extraction (the Python/Arrow site) -----------------------------------


def extract_raw(spans: DataFrame) -> DataFrame:
    """mapInArrow over text spans → per-span mention + raw-triple arrays.

    Iterator form so the compiled alternation regexes are built once per
    worker (SURVEY.md §7 "what's hard" b), then reused across all Arrow
    batches. Media spans are filtered out before the Python boundary.

    r06: Arrow batches in and out (was mapInPandas). The extraction loop is
    unchanged — per-row regex work IS the payload — but the nested output
    (two list<struct> columns) is assembled as flat value arrays + offset
    arrays (`ListArray.from_arrays` over `StructArray.from_arrays`), and
    the pass-through columns reuse the INPUT batch's Arrow buffers
    zero-copy. The old path built pandas object columns of Python tuple
    lists and paid a per-element object→Arrow struct conversion on every
    batch (guide §4.2: hand whole batches to native constructors).
    """
    import pyarrow as pa

    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            texts = batch.column(2).to_pylist()
            m_surface: list[str] = []
            m_sent: list[int] = []
            m_offsets = [0]
            t_subj: list[str] = []
            t_pred: list[str] = []
            t_obj: list[str] = []
            t_sent: list[int] = []
            t_offsets = [0]
            for text in texts:
                mentions, triples = _extract_from_text(text)
                for surface, sidx in mentions:
                    m_surface.append(surface)
                    m_sent.append(sidx)
                m_offsets.append(len(m_surface))
                for subj, pred, obj, sidx in triples:
                    t_subj.append(subj)
                    t_pred.append(pred)
                    t_obj.append(obj)
                    t_sent.append(sidx)
                t_offsets.append(len(t_subj))
            mentions_arr = pa.ListArray.from_arrays(
                pa.array(m_offsets, type=pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(m_surface, type=pa.string()),
                     pa.array(m_sent, type=pa.int32())],
                    names=["surface", "sent_idx"],
                ),
            )
            triples_arr = pa.ListArray.from_arrays(
                pa.array(t_offsets, type=pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(t_subj, type=pa.string()),
                     pa.array(t_pred, type=pa.string()),
                     pa.array(t_obj, type=pa.string()),
                     pa.array(t_sent, type=pa.int32())],
                    names=["subj_surface", "pred_raw", "obj_surface", "sent_idx"],
                ),
            )
            yield pa.record_batch(
                [batch.column(0), batch.column(1), mentions_arr, triples_arr],
                names=["doc_id", "span_order", "mentions", "raw_triples"],
            )

    text_spans = spans.filter(F.col("kind") == "text").select(
        "doc_id", "span_order", "text"
    )
    # Merge over-fine scan splits to ~2 tasks per core before the Python
    # boundary (narrow coalesce — no shuffle, no-op when the input is
    # already at or below the target). Callers tune
    # spark.sql.files.maxPartitionBytes down so CPU-dense corpora aren't
    # capped by split count, but past ~2×cluster-width the extra tasks are
    # pure overhead: at the sf1.0 bench the 96 KB splits produced 512 tasks
    # of ~12 ms of regex work each, and per-task scheduling + Arrow
    # round-trip dwarfed the extraction itself (measured 4.2 s for ~6 s of
    # single-core Python work on 32 cores). Guide §2.2: fewer, larger map
    # tasks; §4: amortize the Python-worker round trip per task.
    target = 2 * spans.sparkSession.sparkContext.defaultParallelism
    return text_spans.coalesce(target).mapInArrow(run, schema=_EXTRACT_SCHEMA)


# --- dictionary DataFrames (broadcast sides) --------------------------------


# Dictionary frames are cached per live session (keyed by Spark applicationId,
# NOT id(spark) — CPython can reuse a dead session object's address, handing
# back DataFrames bound to a stopped SparkContext): rebuilding +
# re-broadcasting ~350 constant rows on every resolve call costs a fixed few
# hundred ms per job — pure Amdahl overhead at high parallelism.
_dict_cache: dict[tuple[str, str], DataFrame] = {}


def _cached_dict(spark: SparkSession, key: str, build) -> DataFrame:
    cache_key = (spark.sparkContext.applicationId, key)
    if cache_key not in _dict_cache:
        _dict_cache[cache_key] = build().cache()
    return _dict_cache[cache_key]


def alias_df(spark: SparkSession) -> DataFrame:
    """surface → (label, type, entity_class): the J3 alias dictionary; always
    broadcast (north-rule requirement)."""
    return _cached_dict(
        spark,
        "alias",
        lambda: spark.createDataFrame(
            G.alias_rows(),
            schema="surface string, label string, type string, entity_class string",
        ),
    )


def semantic_map_df(spark: SparkSession) -> DataFrame:
    return _cached_dict(
        spark,
        "semantic",
        lambda: spark.createDataFrame(
            [(s, t, p, c) for (s, t, p), c in SEMANTIC_RELATIONSHIP_MAP.items()],
            schema="sm_src_type string, sm_dst_type string, sm_pred string, canonical string",
        ),
    )


def direction_df(spark: SparkSession) -> DataFrame:
    return _cached_dict(
        spark,
        "direction",
        lambda: spark.createDataFrame(
            [(p, s, t) for p, (s, t) in DIRECTION_SEMANTICS.items()],
            schema="dir_pred string, expected_src string, expected_dst string",
        ),
    )


# --- resolution: T3/T4/T5 ----------------------------------------------------


def resolve_triples(spark: SparkSession, raw: DataFrame) -> DataFrame:
    """Raw surface triples → canonical typed triples (TRIPLE_SCHEMA).

    Join order mirrors reference semantics exactly (graph_extractor.py:536-562):
    alias resolution → T4 canonical-predicate rewrite → T5 direction flip
    (no re-normalization after the flip).
    """
    aliases = F.broadcast(alias_df(spark))
    exploded = raw.select(
        "doc_id", F.explode("raw_triples").alias("t")
    ).select(
        "doc_id",
        F.col("t.subj_surface").alias("subj_surface"),
        F.col("t.pred_raw").alias("pred_raw"),
        F.col("t.obj_surface").alias("obj_surface"),
    )

    subj_alias = aliases.select(
        F.col("surface").alias("subj_surface"),
        F.col("label").alias("subj"),
        F.col("type").alias("subj_type"),
    )
    obj_alias = aliases.select(
        F.col("surface").alias("obj_surface"),
        F.col("label").alias("obj"),
        F.col("type").alias("obj_type"),
    )
    resolved = (
        exploded.join(F.broadcast(subj_alias), "subj_surface", "inner")
        .join(F.broadcast(obj_alias), "obj_surface", "inner")
    )

    # T4: canonical predicate via 21-row broadcast map
    sem = F.broadcast(semantic_map_df(spark))
    resolved = resolved.join(
        sem,
        (resolved.subj_type == sem.sm_src_type)
        & (resolved.obj_type == sem.sm_dst_type)
        & (resolved.pred_raw == sem.sm_pred),
        "left",
    ).withColumn("pred", F.coalesce(F.col("canonical"), F.col("pred_raw")))

    # T5: flip when observed types are exactly the expected pair swapped
    direc = F.broadcast(direction_df(spark))
    resolved = resolved.join(direc, resolved.pred == direc.dir_pred, "left")
    flip = (
        F.col("expected_src").isNotNull()
        & (F.col("subj_type") == F.col("expected_dst"))
        & (F.col("obj_type") == F.col("expected_src"))
    )
    resolved = (
        resolved.withColumn("f_subj", F.when(flip, F.col("obj")).otherwise(F.col("subj")))
        .withColumn("f_subj_type", F.when(flip, F.col("obj_type")).otherwise(F.col("subj_type")))
        .withColumn("f_obj", F.when(flip, F.col("subj")).otherwise(F.col("obj")))
        .withColumn("f_obj_type", F.when(flip, F.col("subj_type")).otherwise(F.col("obj_type")))
    )

    # distinct over ALL output columns (types are functionally dependent on
    # the entity, so the key is equivalent to (doc_id, subj, pred, obj)) —
    # this compiles to a partial+final HashAggregate instead of the
    # Sort+SortAggregate a dropDuplicates-with-carried-columns would plan
    return (
        resolved.select(
            "doc_id",
            F.col("f_subj").alias("subj"),
            F.col("f_subj_type").alias("subj_type"),
            "pred",
            F.col("f_obj").alias("obj"),
            F.col("f_obj_type").alias("obj_type"),
        )
        .distinct()
        .withColumn("confidence", F.lit(0.7))  # T3 default, graph_extractor.py:438
    )


def resolve_mentions(spark: SparkSession, raw: DataFrame) -> DataFrame:
    """Distinct (doc_id, label, type, entity_class) mention set — node
    candidates; alias dictionary broadcast."""
    aliases = F.broadcast(alias_df(spark))
    return (
        raw.select("doc_id", F.explode("mentions").alias("m"))
        .select("doc_id", F.col("m.surface").alias("surface"))
        .join(aliases, "surface", "inner")
        .select("doc_id", "label", "type", "entity_class")
        .dropDuplicates(["doc_id", "label", "type"])
    )


def edge_class_col(pred: F.Column) -> F.Column:
    """edge_class tagging (graph_extractor.py:479-482)."""
    return (
        F.when(pred.isin(*ATTACK_CHAIN_PREDICATES), F.lit("attack_chain"))
        .when(pred.isin(*CONNECTION_PREDICATES), F.lit("connection"))
        .otherwise(F.lit(None).cast("string"))
    )


def mention_doc_sets(spark: SparkSession, raw: DataFrame,
                     salted: bool = True, buckets: int = 16) -> DataFrame:
    """Per-entity distinct-doc sets + mention counts — the aggregation the
    Zipf hub entities skew hardest (one Organization/ExternalIP appears in a
    large share of docs, FIXTURES.md F1). ``salted=True`` takes the two-phase
    path (operators/skew.salted_collect_set): hub keys fan over ``buckets``
    reducers before the distinct sets meet; results are identical."""
    from .skew import salted_collect_set

    aliases = F.broadcast(alias_df(spark))
    mentions = (
        raw.select("doc_id", F.explode("mentions").alias("m"))
        .select("doc_id", F.col("m.surface").alias("surface"))
        .join(aliases, "surface", "inner")
        .select("doc_id", "label", "type")
    )
    if salted:
        out = salted_collect_set(
            mentions, ["label", "type"], "doc_id", "doc_set",
            buckets=buckets, extra_aggs={"n_mentions": F.count("*")},
        )
    else:
        out = mentions.groupBy("label", "type").agg(
            F.collect_set("doc_id").alias("doc_set"),
            F.count("*").alias("n_mentions"),
        )
    return out.select(
        "label", "type", F.size("doc_set").alias("n_docs"), "n_mentions"
    )


def extract_triples(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """T6 orchestration: documents → canonical triples."""
    return resolve_triples(spark, extract_raw(explode_spans(docs)))


def extract_mentions(spark: SparkSession, docs: DataFrame) -> DataFrame:
    return resolve_mentions(spark, extract_raw(explode_spans(docs)))
