"""Bucketed co-located joins (SURVEY.md §4: "optional bucketing/Z-order on
node_id"; task brief: "bucketing for co-located joins").

Writing nodes and edges bucketed + sorted on the join key lets Catalyst plan
the endpoint-resolution join (J1) and the edge-remap join (J2) with ZERO
exchanges — both sides are already hash-distributed identically, so a
SortMergeJoin runs bucket-local. At 10^12-edge scale this removes the
largest shuffle in graph materialization.

Sandbox caveat: bucket metadata lives in the session catalog (no external
metastore here), so bucketed tables are registered per session via
``saveAsTable``; on a real deployment the same calls target a persistent
catalog (Hive/Iceberg) and survive restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. Sorting within buckets lets SortMergeJoin skip its sort too."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def register_bucketed(
    spark: SparkSession,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
) -> None:
    """(Re-)register an existing bucketed parquet directory in the session
    catalog. Bucket metadata is catalog state — a NEW session resuming over a
    warehouse that already holds bucketed files must re-declare the spec, not
    rewrite the data (pinned by the kg_submit resume test: the second CLI run
    performs zero data writes). The declared spec must match how the files
    were written (write_bucketed), or joins would be silently wrong."""
    schema = spark.read.parquet(path).schema
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    cols = ", ".join(f"`{c}`" for c in bucket_cols)
    spark.sql(
        f"CREATE TABLE {table_name} ({fields}) USING parquet "
        f"CLUSTERED BY ({cols}) SORTED BY ({cols}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys — planned
    without Exchange when bucket specs match (verify via explain; pinned in
    tests/test_plan_quality.py::test_bucketed_join_no_exchange)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
