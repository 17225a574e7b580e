"""Stats + data-quality rollups (SURVEY.md §2.5 A18/A19).

Reference: the ``/network/stats`` endpoint's conditional-sum pivots
(``network.py:309-431``) and the data-quality orphan checks
(``network.py:652-668``). All conditional counts compile to
``sum(when(cond,1))`` — one pass over each table."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """One-row summary: node/edge counts, internal/external split, anomaly
    aggregate, attacker count (A18)."""
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    n = nodes.agg(
        F.count("*").alias("total_nodes"),
        flag(F.col("type").isin("InternalIP", "ExternalIP")).alias("ip_nodes"),
        flag(F.col("is_internal") == True).alias("internal_ips"),  # noqa: E712
        flag(F.col("is_internal") == False).alias("external_ips"),  # noqa: E712
        flag(F.col("type") == "Port").alias("port_nodes"),
        flag(F.col("is_attacker") == True).alias("attacker_ips"),  # noqa: E712
        flag(F.col("is_anomaly") == True).alias("anomalous_nodes"),  # noqa: E712
        F.round(F.avg(F.when(F.col("anomaly_score") > 0, F.col("anomaly_score"))), 4)
        .alias("avg_anomaly_score"),
    )
    e = edges.agg(
        F.count("*").alias("total_edges"),
        flag(F.col("rel_type") == "CONNECTED_TO").alias("connection_edges"),
        flag(F.col("is_anomaly") == True).alias("anomalous_edges"),  # noqa: E712
        F.sum(F.coalesce(F.col("bytes"), F.lit(0))).alias("total_bytes"),
    )
    return n.crossJoin(e)


def service_distribution(nodes: DataFrame, top_k: int = 10) -> DataFrame:
    """Service histogram from port-node props (A18 service distribution)."""
    return (
        nodes.filter(F.col("type") == "Port")
        .select(F.col("props")["service"].alias("service"))
        .groupBy("service")
        .count()
        .orderBy(F.desc("count"), "service")
        .limit(top_k)
    )


def attack_distribution(nodes: DataFrame) -> DataFrame:
    """Attack-type histogram from IP-node attack_types arrays (A18)."""
    return (
        nodes.filter(F.size(F.coalesce(F.col("attack_types"), F.array())) > 0)
        .select(F.explode("attack_types").alias("attack_type"))
        .groupBy("attack_type")
        .count()
        .orderBy(F.desc("count"), "attack_type")
    )


def data_quality(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A19: invalid labels + orphaned ports (no incoming USES_PORT) + dangling
    edge endpoints, as one row.

    Single declarative plan with ZERO driver actions (was four separate
    counts, each recomputing its inputs): the anti-join counts become
    left-join-is-null conditional sums, the two one-row aggs cross-join.
    The caller triggers exactly one job."""
    used_ports = (
        edges.filter(F.col("rel_type") == "USES_PORT")
        .select(F.col("dst").alias("node_id"))
        .distinct()
        .withColumn("_used", F.lit(1))
    )
    node_flags = nodes.join(used_ports, "node_id", "left").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("label").isNull() | (F.trim(F.col("label")) == ""), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("invalid_labels"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("type") == "Port") & F.col("_used").isNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("orphaned_ports"),
    )
    node_ids = nodes.select("node_id").distinct()
    src_ids = node_ids.select(F.col("node_id").alias("src")).withColumn(
        "_src_ok", F.lit(1)
    )
    dst_ids = node_ids.select(F.col("node_id").alias("dst")).withColumn(
        "_dst_ok", F.lit(1)
    )
    edge_flags = (
        edges.join(src_ids, "src", "left")
        .join(dst_ids, "dst", "left")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_src_ok").isNull(), 1).otherwise(0))
                + F.sum(F.when(F.col("_dst_ok").isNull(), 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("dangling_edges")
        )
    )
    return node_flags.crossJoin(edge_flags)
