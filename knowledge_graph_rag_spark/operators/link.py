"""Entity linking: alias-dictionary, embedding-similarity and MinHash-LSH
candidate generation (SURVEY.md §2.4 J3, §2.11; north-rule requirements).

The reference links entities by exact normalized key (``graph_merger.py:
204-240``) — that lives in functions/net.normalize_key and drives the merge.
This module adds the scale-path linkers the north rule demands:

- ``embed_surfaces``: deterministic feature-hash embedding (pandas UDF) — the
  reference uses no embeddings (docs/CASE_STUDY.md:69), so we fix a seeded,
  model-free embedding that makes similarity linking testable.
- ``cosine_link``: bucketed cosine-similarity join of surface forms.
- ``minhash_link``: Spark ML MinHashLSH ``approxSimilarityJoin`` over 3-gram
  shingle sets (JVM-side; zero Python on the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 64


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_surfaces(s: pd.Series) -> pd.Series:
    """Feature-hash character-trigram embedding, L2-normalized.

    Vectorized: one numpy pass per Arrow batch. Deterministic (numpy's
    legacy hash-free path: trigram byte values folded with fixed primes), so
    linking tests are reproducible anywhere.
    """

    def embed(text: str | None) -> list[float]:
        v = np.zeros(EMBED_DIM, dtype=np.float64)
        if text:
            b = text.lower().encode("utf-8")
            for i in range(len(b) - 2):
                h = (b[i] * 131071 + b[i + 1] * 8191 + b[i + 2] * 127) % EMBED_DIM
                sign = 1.0 if (b[i] ^ b[i + 1] ^ b[i + 2]) & 1 else -1.0
                v[h] += sign
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        return v.astype(np.float32).tolist()

    return s.map(embed)


def cosine_sim_col(a, b):
    """Native cosine over two array<float> columns: zip_with + aggregate —
    stays in the JVM (SURVEY.md guidance on similarity search)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_link(
    surfaces: DataFrame,
    threshold: float = 0.85,
    surface_col: str = "surface",
) -> DataFrame:
    """Pairs of distinct surface forms with embedding cosine ≥ threshold.

    Blocking key = first token lowered — turns the O(n²) self-join into
    per-block joins (the IVF-style scale path; exact brute force within
    block). Returns (surface_a, surface_b, cosine).
    """
    emb = (
        surfaces.select(surface_col)
        .distinct()
        .withColumn("emb", embed_surfaces(F.col(surface_col)))
        .withColumn("block", F.lower(F.split(F.col(surface_col), r"\s+")[0]))
    )
    a = emb.select(
        F.col("block"),
        F.col(surface_col).alias("surface_a"),
        F.col("emb").alias("emb_a"),
    )
    b = emb.select(
        F.col("block"),
        F.col(surface_col).alias("surface_b"),
        F.col("emb").alias("emb_b"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("surface_a") < F.col("surface_b"))
        .withColumn("cosine", cosine_sim_col(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cosine") >= threshold)
        .select("surface_a", "surface_b", F.round("cosine", 4).alias("cosine"))
    )


def minhash_link(
    surfaces: DataFrame,
    surface_col: str = "surface",
    jaccard_max_dist: float = 0.5,
    num_hash_tables: int = 8,
) -> DataFrame:
    """Near-duplicate surface forms via MinHashLSH over character 3-gram sets
    (SURVEY.md §4 item 3 — ``approxSimilarityJoin`` is the built-in
    specialized join; all JVM)."""
    # localCheckpoint: the ML fit + LSH join re-evaluate their input several
    # times; a lazily-recomputed (UDF-sourced) plan must be pinned to a stable
    # materialization first or CountVectorizer's vocabulary and the transform
    # input can diverge. The distinct-surface set is bounded by vocabulary
    # size, so this is cheap at any corpus scale.
    df = (
        surfaces.select(surface_col)
        .distinct()
        .localCheckpoint(eager=True)
        .withColumn("chars", F.split(F.lower(F.col(surface_col)), ""))
    )
    ngram = NGram(n=3, inputCol="chars", outputCol="shingles")
    shingled = ngram.transform(df).filter(F.size("shingles") > 0)
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
    model = cv.fit(shingled)
    feats = model.transform(shingled)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    lsh_model = lsh.fit(feats)
    joined = lsh_model.approxSimilarityJoin(feats, feats, jaccard_max_dist, "jaccard_dist")
    return (
        joined.filter(F.col(f"datasetA.{surface_col}") < F.col(f"datasetB.{surface_col}"))
        .select(
            F.col(f"datasetA.{surface_col}").alias("surface_a"),
            F.col(f"datasetB.{surface_col}").alias("surface_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )
