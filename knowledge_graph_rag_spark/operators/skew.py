"""Skew handling: salted two-phase aggregation for hub entities.

Plain sums/counts already get map-side partial aggregation from Spark; the
aggregations that hurt under Zipf-skewed keys are the set/list collectors
(A2 port sets, A7 fan-out, A17 struct-collect — SURVEY.md §4 item 1) and any
groupBy whose hot key would pin one reducer at 10^12-doc scale.

``salted_collect_set`` does the classic two-phase rewrite:

  phase 1: groupBy(key, salt = pmod(hash(cols), k)) → partial collect_set
  phase 2: groupBy(key) → array_distinct(flatten(partial sets))

so a hub key's rows spread over k reducers before the (much smaller) distinct
sets meet. AQE's skew-join splitting covers the join side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], buckets: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a hash of ``cols`` — no
    ``rand()`` so re-runs and resume are stable."""
    return df.withColumn(salt_col, F.pmod(F.hash(*cols), F.lit(buckets)))


def salted_collect_set(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str,
    buckets: int = 16,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase collect_set keyed on ``group_cols`` with hub-key salting.

    ``extra_aggs`` maps output name → additive aggregate expression
    (count/sum), computed per salt bucket and re-summed in phase 2.
    """
    salted = with_salt(df, [value_col], buckets)
    phase1_aggs = [F.collect_set(value_col).alias("_partial_set")]
    extra_names: list[str] = []
    for name, agg in (extra_aggs or {}).items():
        phase1_aggs.append(agg.alias(name))
        extra_names.append(name)
    phase1 = salted.groupBy(*group_cols, "_salt").agg(*phase1_aggs)
    phase2_aggs = [
        F.array_distinct(F.flatten(F.collect_list("_partial_set"))).alias(out_col)
    ] + [F.sum(n).alias(n) for n in extra_names]
    return phase1.groupBy(*group_cols).agg(*phase2_aggs)


def salted_count_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase exact distinct count: dedup on (key, salt, value) first, then
    count — equivalent result, hub key fanned over ``buckets`` reducers."""
    salted = with_salt(df, [value_col], buckets)
    phase1 = (
        salted.select(*group_cols, "_salt", value_col)
        .dropDuplicates([*group_cols, "_salt", value_col])
        .groupBy(*group_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return phase1.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))
