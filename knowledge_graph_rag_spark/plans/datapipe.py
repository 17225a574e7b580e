"""Composed training-data curation pipeline — resumable, lineage-tracked.

The LLM-data-pipeline operators (dedup / quality / sampling / token stats)
exist individually; at 100 TB their COMPOSITION is itself engine work: what
is materialized between stages, where the pipeline can resume after a crash,
and which counts survive as lineage. This plan chains them the same way
``pipeline.run`` chains KG construction — every stage commits a snapshot
through GraphStore and records itself in the manifest, so a killed job
resumes idempotently with zero recomputation of completed stages.

    stage exact_dedup   md5 content-hash first-seen-wins (one shuffle)
    stage near_dedup    MinHash-LSH candidate pairs → connected components
                        → min-id representative per cluster (drop the rest)
    stage quality       Gopher-rule gate (functions.text.gopher_quality_cols,
                        oracle-pinned via the gopher_quality_flags entry)
    stage sample        deterministic md5-bucket sampling — partition- and
                        cluster-size-independent membership
    stage token_stats   per-doc whitespace + BPE-style token counts, language
                        ID — the training-mix accounting table
    stage metrics       one lineage row per stage (rows in/out) appended to
                        the ``dp_metrics`` table

Scale shape: each stage's output is a parquet snapshot, so the longest
lineage a failure can lose is ONE stage; every stage is a pure function of
the previous snapshot. Counts are computed once per stage from the written
snapshot (a metadata-cheap count on parquet footers), not by re-executing
the transform.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import canonicalize as C
from ..operators import dedup as DD
from ..operators.sampling import hash_sample
from ..sources.graph_store import GraphStore


@dataclass
class CurationResult:
    run_id: str
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    counts: dict[str, int] = field(default_factory=dict)


def _near_dup_drop_ids(docs: DataFrame, jaccard_max_dist: float,
                       strategy: str = "minhash",
                       verify_threshold: float | None = None) -> DataFrame:
    """ids to DROP: near-dup candidate pairs → connected components →
    everything except the min-id representative of each cluster. Bounded by
    the candidate-pair graph, not the corpus (banding prunes first).
    ``strategy``: 'minhash' (Spark ML LSH — higher recall on shingle
    overlap) or 'simhash' (banded 64-bit simhash — one vectorized UDF pass
    + 4 equi-joins, the cheaper scale path; Hamming ≤ 3).

    ``verify_threshold``: when set, candidate pairs are confirmed by EXACT
    word-3-gram Jaccard ≥ threshold (verify_pairs_exact_jaccard — O(pairs),
    corpus-size-independent) before connected components. Without it, a
    candidate-generation false positive (an LSH banding collision between
    genuinely dissimilar docs, or a simhash bag-of-words collision between
    docs that share tokens but not phrases) PERMANENTLY deletes a good
    document from the corpus — the r04 verdict #2 failure mode. The drop
    decision is irreversible, so production curation wants this on."""
    if strategy == "minhash":
        pairs = DD.minhash_lsh_pairs(
            docs, id_col="doc_id", text_col="text",
            jaccard_max_dist=jaccard_max_dist,
        )
    elif strategy == "simhash":
        # library default max_hamming=3 — the regime where the 4×16-bit
        # banding is pigeonhole-COMPLETE (≤3 flipped bits always share a
        # band); a looser threshold would silently miss pairs whose diff
        # bits straddle all four bands
        pairs = DD.simhash_pairs(docs, id_col="doc_id", text_col="text")
    else:
        raise ValueError(f"unknown near-dup strategy: {strategy!r}")
    if verify_threshold is not None:
        pairs = DD.verify_pairs_exact_jaccard(
            pairs, docs, id_col="doc_id", text_col="text",
            threshold=verify_threshold,
        )
    cc = C.connected_components(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    )
    return cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )


def curate(
    spark: SparkSession,
    docs: DataFrame,
    store: GraphStore,
    dataset_id: str = "corpus",
    run_id: str = "cur0",
    near_dup_max_dist: float = 0.2,
    sample_fraction: float = 1.0,
    lang_fractions: dict[str, float] | None = None,
    near_dup_strategy: str = "minhash",
    near_dup_verify_threshold: float | None = None,
    benchmark: DataFrame | None = None,
    decontam_ngram: int = 13,
    pii_scrub: bool = False,
) -> CurationResult:
    """Run the curation chain over ``docs`` (doc_id, text, …). Stage outputs
    land as ``dp_<dataset_id>_<stage>`` snapshots; re-running with the same
    (warehouse, dataset_id) skips completed stages (S9 resume semantics).

    ``lang_fractions`` switches the sample stage to LANGUAGE-STRATIFIED
    deterministic sampling (the standard training-mix rebalance: e.g.
    ``{"en": 0.3, "de": 1.0}`` downsamples English to 30% and keeps all
    German): language is derived per-doc with the oracle-pinned decision
    rule (functions.text.language_id_col), membership stays a pure function
    of md5(doc_id) — partition/cluster-independent. Languages absent from
    the dict default to ``sample_fraction``.

    ``near_dup_verify_threshold``: exact-Jaccard confirmation of near-dup
    candidates before any document is dropped (see _near_dup_drop_ids) —
    an unverified banding collision otherwise deletes a good doc forever.

    ``benchmark``: when given, an opt-in ``decontam`` stage (between
    near-dedup and quality) drops every doc with ANY word
    ``decontam_ngram``-gram overlap against the benchmark/eval frame
    (operators.decontam.decontaminate — broadcast overlap mark, the
    published 13-gram rule by default). ``pii_scrub=True`` adds an opt-in
    ``pii_scrub`` stage after quality that REPLACES ``text`` with its
    class-token redaction (functions.pii.redact_pii_col — one narrow
    codegen stage) so token stats and everything downstream see scrubbed
    text. Both knobs join the config fingerprint only when set, so legacy
    datasets resume under default knobs without a config-mismatch refusal
    (same pattern as ``near_dup_verify_threshold``)."""
    res = CurationResult(run_id=run_id)
    metrics_rows: list[tuple] = []

    # Resume is keyed by (stage, dataset_id), NOT by the knob values — so a
    # re-run with different knobs against an already-curated dataset would
    # silently skip every stage and report counts from the OLD
    # configuration. ONE config slot per dataset holds the fingerprint:
    # - stages done + slot mismatch → refuse (new dataset_id to re-curate);
    # - stages done + NO slot (dataset from before this guard) → adopt the
    #   current knobs into the slot (legacy migration, same policy as the
    #   GraphStore legacy-snapshot migration);
    # - nothing done → (re)write the slot freely — a crashed zero-stage run
    #   must not whitelist its config forever (single slot, overwritten).
    import hashlib as _hl

    # verify_threshold joins the fingerprint only when set: r04-era datasets
    # were curated before the knob existed, and their stored cfg_key must
    # keep matching a default-knob resume (appending None unconditionally
    # would turn every legacy resume into a config-mismatch refusal)
    if benchmark is not None:
        # the fingerprint must capture WHICH benchmark, not just that one
        # was used — otherwise re-curating against a new eval set silently
        # resumes with the old decontam output (the exact hazard this guard
        # exists for). Content hash, order-insensitive (sum of row digests
        # mod 2^63): one narrow scan of the benchmark frame, which is an
        # eval suite — bounded by design.
        bench_fp = (
            benchmark.select(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("\x01", "doc_id", "text")), 1, 15
                    ),
                    16, 10,
                ).cast("long").alias("h")
            )
            .agg(
                F.count("*").alias("n"),
                # decimal sum: a long sum could overflow on a huge frame
                (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(2 ** 62))
                .alias("s"),
            )
            .first()
        )
        bench_key = (bench_fp["n"], int(bench_fp["s"] or 0))
    cfg = repr((near_dup_max_dist, sample_fraction,
                sorted((lang_fractions or {}).items()), near_dup_strategy)
               + ((near_dup_verify_threshold,)
                  if near_dup_verify_threshold is not None else ())
               + (("decontam", decontam_ngram, bench_key)
                  if benchmark is not None else ())
               + (("pii_scrub",) if pii_scrub else ()))
    cfg_key = _hl.md5(cfg.encode()).hexdigest()[:12]
    any_done = any(
        store.is_done(f"dp_{s}", dataset_id)
        for s in ("exact_dedup", "near_dedup", "decontam", "quality",
                  "pii_scrub", "sample", "token_stats")
    )
    slot = store.stage_meta("dp_config", dataset_id)
    if any_done and slot is not None and slot.get("cfg_key") != cfg_key:
        raise ValueError(
            f"dataset {dataset_id!r} was curated with a different "
            f"configuration — resume would silently ignore the new knobs; "
            f"use a new dataset_id (or the original settings)"
        )
    if slot is None or slot.get("cfg_key") != cfg_key:
        store.mark_done("dp_config", dataset_id, run_id=run_id,
                        cfg_key=cfg_key, config=cfg)

    def tbl(stage: str) -> str:
        return f"dp_{dataset_id}_{stage}"

    def stage(name: str, compute) -> DataFrame:
        if store.is_done(f"dp_{name}", dataset_id):
            res.stages_skipped.append(name)
        else:
            store.write_snapshot(tbl(name), compute(), partition_by=())
            store.mark_done(f"dp_{name}", dataset_id, run_id=run_id)
            res.stages_run.append(name)
        out = store.read(tbl(name))
        n = out.count()
        res.counts[name] = n
        metrics_rows.append((run_id, name, n))
        return out

    exact = stage(
        "exact_dedup", lambda: DD.dedup_exact(docs, "doc_id", "text")
    )
    near = stage(
        "near_dedup",
        lambda: exact.join(
            _near_dup_drop_ids(exact, near_dup_max_dist, near_dup_strategy,
                               near_dup_verify_threshold)
            if near_dup_strategy != "none"
            else exact.limit(0).select("doc_id"),
            "doc_id", "left_anti",
        ),
    )

    cur = near
    if benchmark is not None:

        def compute_decontam():
            from ..operators.decontam import decontaminate

            drop = decontaminate(
                near, benchmark, id_col="doc_id", text_col="text",
                n=decontam_ngram,
            ).filter(F.col("contaminated")).select("doc_id")
            return near.join(drop, "doc_id", "left_anti")

        cur = stage("decontam", compute_decontam)

    pre_quality = cur

    def compute_quality():
        from ..functions.text import gopher_quality_cols

        q = gopher_quality_cols(F.col("text"))
        return (
            pre_quality.withColumn("keep", q["keep"]).filter("keep")
            .drop("keep")
        )

    quality = stage("quality", compute_quality)

    cur = quality
    if pii_scrub:

        def compute_pii():
            from ..functions.pii import redact_pii_col

            return quality.withColumn("text", redact_pii_col(F.col("text")))

        cur = stage("pii_scrub", compute_pii)

    pre_sample = cur

    def compute_sample():
        if lang_fractions is None:
            return hash_sample(pre_sample, "doc_id", sample_fraction)
        from ..functions.text import language_id_col
        from ..operators.sampling import stratified_hash_sample

        with_lang = pre_sample.withColumn(
            "lang", language_id_col(F.col("text"))
        )
        return stratified_hash_sample(
            with_lang, "doc_id", "lang", lang_fractions,
            default_fraction=sample_fraction,
        ).drop("lang")

    sampled = stage("sample", compute_sample)

    def compute_token_stats():
        from ..functions.text import BPE_PRETOKEN_REGEX, GOPHER_WS

        ws_toks = F.filter(
            F.split(F.col("text"), GOPHER_WS + "+"), lambda x: x != F.lit("")
        )
        # THE pinned pre-tokenizer definition (oracle-pinned via the
        # bpe_token_counts driver entry) — never an inline copy
        return sampled.select(
            "doc_id",
            F.size(ws_toks).cast("long").alias("ws_tokens"),
            F.size(F.regexp_extract_all(
                F.col("text"), F.lit(BPE_PRETOKEN_REGEX), 0
            )).cast("long").alias("bpe_tokens"),
            F.length("text").cast("long").alias("chars"),
        )

    stage("token_stats", compute_token_stats)

    metrics = spark.createDataFrame(
        metrics_rows, "run_id string, stage string, rows_out long"
    )
    store.write_snapshot(tbl("metrics"), metrics, partition_by=())
    return res
