"""Rolling-hash document fingerprinting (winnowing / MOSS — Schleimer,
Wilkerson, Aiken, SIGMOD 2003).

Char-level k-gram rolling hashes, then the minimum hash per sliding window
("winnowing") — the classic shift-robust fingerprint: inserting or moving a
paragraph changes only the fingerprints that overlap the edit, unlike the
whole-document md5 in ``doc_fingerprints``. Two documents sharing a long
passage share its fingerprints, so near-dup candidate generation is a plain
equi-join on (fingerprint) — the same bucket-join shape as the other dedup
paths in operators/dedup.

The hash pipeline is numpy-vectorized per Arrow batch (sliding-window matrix
multiply mod 2^31−1 — no per-character Python loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MOD = (1 << 31) - 1
_BASE = 257


def winnow(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowed fingerprint set of one string (sorted, deduped)."""
    if not text or len(text) < k:
        return []
    c = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    if c.size < k:
        return []
    weights = np.array(
        [pow(_BASE, k - 1 - j, _MOD) for j in range(k)], dtype=np.int64
    )
    grams = np.lib.stride_tricks.sliding_window_view(c, k).astype(np.int64)
    hashes = (grams @ weights) % _MOD
    if hashes.size <= window:
        return sorted({int(hashes.min())})
    mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    return sorted({int(m) for m in mins})


def winnow_fingerprints(
    df: DataFrame, id_col: str = "id", text_col: str = "text",
    k: int = 8, window: int = 4,
) -> DataFrame:
    """(id, fingerprint) exploded rows — join two docs' rows on fingerprint
    to count shared passages. The id column keeps the INPUT's type (string
    doc_ids from the pipeline corpus work as well as the benchmark bigints)."""
    out_schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("fingerprint", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, fps = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                for fp in winnow(t, k, window):
                    ids.append(i)
                    fps.append(fp)
            yield pd.DataFrame({"id": ids, "fingerprint": fps})

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def shared_passage_pairs(
    df: DataFrame, id_col: str = "id", text_col: str = "text",
    min_shared: int = 5, k: int = 8, window: int = 4, max_df: int = 100,
) -> DataFrame:
    """Near-dup / shared-passage pairs: docs sharing ≥ min_shared winnowed
    fingerprints. Fingerprints with document frequency > max_df are dropped
    before the join (same quadratic guard as ngram_jaccard_pairs). The
    UDF-sourced fingerprint frame is checkpointed once — it feeds the df
    aggregation AND both self-join sides (3 consumers)."""
    fp = winnow_fingerprints(df, id_col, text_col, k, window).localCheckpoint(
        eager=False
    )
    dfs = fp.groupBy("fingerprint").agg(F.count("*").alias("df"))
    fp_ok = fp.join(dfs.filter(F.col("df") <= max_df), "fingerprint", "left_semi")
    a, b = fp_ok.alias("a"), fp_ok.alias("b")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def duplicated_passage_stats(
    df: DataFrame, id_col: str = "id", text_col: str = "text",
    k: int = 8, window: int = 4,
) -> DataFrame:
    """Per-document duplicated-passage profile: (id, n_fps, n_shared_fps,
    dup_ratio) where n_shared_fps counts the doc's winnowed fingerprints
    that also occur in ANOTHER document — the standard curation signal for
    boilerplate/templated content (a doc can be globally unique yet 90%
    assembled from passages seen elsewhere; exact/near dedup won't flag it,
    this does). The cross-doc occurrence count is a window over
    partitionBy(fingerprint) sharing ONE Exchange with nothing else needed
    — same spill-safe shape as the ngram df cap; per-doc fingerprints are
    deduped by winnow(), so the window count IS document frequency."""
    from pyspark.sql import Window

    fp = winnow_fingerprints(df, id_col, text_col, k, window)
    w = Window.partitionBy("fingerprint")
    marked = fp.withColumn("dfp", F.count("*").over(w))
    stats = marked.groupBy("id").agg(
        F.count("*").alias("n_fps"),
        F.sum((F.col("dfp") >= 2).cast("long")).alias("n_shared_fps"),
    )
    # docs shorter than k produce ZERO fingerprints and would silently
    # vanish from a groupBy-only profile — exactly the rows a curation
    # consumer joins on; keep every input doc with an explicit zero row
    return (
        df.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            "id",
            F.coalesce("n_fps", F.lit(0).cast("long")).alias("n_fps"),
            F.coalesce("n_shared_fps", F.lit(0).cast("long")).alias(
                "n_shared_fps"
            ),
        )
        .withColumn(
            "dup_ratio",
            F.when(F.col("n_fps") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("n_shared_fps") / F.col("n_fps"), 4)
            ),
        )
    )
