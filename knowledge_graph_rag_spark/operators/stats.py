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
    edge endpoints, as one row. Orphans via left anti join."""
    null_labels = nodes.filter(
        F.col("label").isNull() | (F.trim(F.col("label")) == "")
    ).count()
    used_ports = edges.filter(F.col("rel_type") == "USES_PORT").select(
        F.col("dst").alias("node_id")
    )
    orphan_ports = (
        nodes.filter(F.col("type") == "Port")
        .join(used_ports, "node_id", "left_anti")
        .count()
    )
    node_ids = nodes.select("node_id")
    dangling = (
        edges.join(node_ids.withColumnRenamed("node_id", "src"), "src", "left_anti")
        .count()
        + edges.join(node_ids.withColumnRenamed("node_id", "dst"), "dst", "left_anti")
        .count()
    )
    spark = nodes.sparkSession
    return spark.createDataFrame(
        [(null_labels, orphan_ports, dangling)],
        "invalid_labels long, orphaned_ports long, dangling_edges long",
    )
