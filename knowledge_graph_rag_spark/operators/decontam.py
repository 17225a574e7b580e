"""Benchmark decontamination: n-gram overlap of a corpus against an eval set.

Standard training-data hygiene (GPT-3 appendix-C style): any corpus document
sharing word n-grams with a held-out benchmark/eval suite is flagged (and
usually dropped) so downstream models are not graded on memorized test data.
The reference engine has no analogue — this is one of the beyond-reference
LLM-data-pipeline operators (SURVEY §2 extension set), built Spark-first.

Scale shape (the part that matters at 100 TB):
- The corpus side is shingled once (``word_shingles`` — distinct (id, gram),
  native transform/explode, no UDF) and aggregated per doc in ONE groupBy.
- The benchmark side is an eval suite — thousands of documents, not billions
  — so its distinct gram set is broadcast by default: the overlap mark is a
  map-side broadcast left join, adding ZERO shuffles beyond the per-doc
  aggregation the stats need anyway. ``broadcast_benchmark=False`` falls
  back to a shuffled join for the (rare) giant-benchmark case.
- Because the benchmark grams are distinct, each corpus (id, gram) row joins
  at most one benchmark row: join output is bounded by the corpus shingle
  count — no hot-key blow-up regardless of how common a gram is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    flag_threshold: float = 0.0,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document benchmark-overlap stats.

    Returns ``(id_col, n_grams, n_contaminated, contamination, contaminated)``
    — one row per corpus document that has at least ``n`` words:
    distinct-gram count, how many of those grams appear anywhere in the
    benchmark, their ratio, and a drop flag (``contamination >
    flag_threshold``; the default 0.0 flags any overlap, the usual
    decontamination policy for 13-grams).

    ``n=13`` is the published default (Brown et al. 2020 use 13-gram
    collision for eval decontamination); tests and the driver entry use
    smaller n because the synthetic corpus is 30-word documents.
    """
    corp_sh = word_shingles(corpus, id_col, text_col, n)
    bench_sh = (
        word_shingles(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    marked = corp_sh.join(bench_sh, "shingle", "left")
    stats = marked.groupBy("id").agg(
        F.count("*").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
    )
    ratio = F.col("n_contaminated") / F.col("n_grams")
    return stats.select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_contaminated",
        ratio.alias("contamination"),
        (ratio > F.lit(float(flag_threshold))).alias("contaminated"),
    )
