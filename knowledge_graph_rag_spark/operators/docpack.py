"""Documented query pack (reference ``docs/CYPHER_QUERIES.md``).

The reference documents analyst queries beyond the 13 runtime templates;
the shapes not already covered by querypack/detectors live here:

- anomalous external connections  (:28-44)
- lateral-movement trace          (:49-66, attack-chain joins)
- attack-surface analysis         (:196-216)
- timeline reconstruction         (:220-238, W4)

(The k-hop attack chain :8-24 is detectors.k_hop_reach; the 10+-port fan-out
:100-118 is detectors.detect_fan_out; cross-graph correlation :179-193 is
graph_build.find_correlations.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anomalous_external_connections(
    nodes: DataFrame, edges: DataFrame, score_threshold: float = 0.7, k: int = 20
) -> DataFrame:
    """Anomalous sources (score > τ) that connected to external hosts:
    per-source distinct external destinations + connection count
    (CYPHER_QUERIES.md:28-44)."""
    srcs = nodes.filter(
        (F.col("is_anomaly") == True) & (F.col("anomaly_score") > score_threshold)  # noqa: E712
    ).select(
        F.col("node_id").alias("src"),
        F.col("label").alias("suspicious_ip"),
        F.col("anomaly_score").alias("score"),
        F.col("anomaly_types").alias("threat_indicators"),
    )
    ext = nodes.filter(F.col("type") == "ExternalIP").select(
        F.col("node_id").alias("dst"), F.col("label").alias("dst_label")
    )
    return (
        edges.filter(F.col("rel_type") == "CONNECTED_TO")
        .join(F.broadcast(srcs), "src", "inner")
        .join(F.broadcast(ext), "dst", "inner")
        .groupBy("suspicious_ip", "score", "threat_indicators")
        .agg(
            F.sort_array(F.collect_set("dst_label")).alias("external_destinations"),
            F.count("*").alias("connection_count"),
        )
        .orderBy(F.desc("score"), "suspicious_ip")
        .limit(k)
    )


def lateral_movement_trace(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """CredentialAccess → LEADS_TO → LateralMovement chains with optional
    downstream indication (CYPHER_QUERIES.md:49-66): two typed node joins on
    the LEADS_TO edge set plus an optional second hop."""
    cred = nodes.filter(F.col("type") == "CredentialAccess").select(
        F.col("node_id").alias("src"), F.col("label").alias("initial_compromise")
    )
    lat = nodes.filter(F.col("type") == "LateralMovement").select(
        F.col("node_id").alias("dst"), F.col("label").alias("movement_type")
    )
    leads = edges.filter(F.col("rel_type") == "LEADS_TO").select("src", "dst")
    hop1 = leads.join(F.broadcast(cred), "src").join(F.broadcast(lat), "dst")
    onward = edges.filter(F.col("rel_type").isin("INDICATES", "LEADS_TO")).select(
        F.col("src").alias("dst"), F.col("dst").alias("onward_id")
    )
    labels = nodes.select(
        F.col("node_id").alias("onward_id"), F.col("label").alias("onward_step")
    )
    return (
        hop1.join(onward, "dst", "left")
        .join(labels, "onward_id", "left")
        .select("initial_compromise", "movement_type", "onward_step")
        .orderBy("initial_compromise", "movement_type", "onward_step")
    )


def attack_surface(nodes: DataFrame, edges: DataFrame, k: int = 20) -> DataFrame:
    """External IPs most connected FROM internal hosts (CYPHER_QUERIES.md:
    196-216): per-external distinct internal peers, >1 host, risk status."""
    ext = nodes.filter(F.col("type") == "ExternalIP").select(
        F.col("node_id").alias("dst"),
        F.col("label").alias("external_ip"),
        F.coalesce(F.col("is_anomaly"), F.lit(False)).alias("ext_anomaly"),
    )
    internal = nodes.filter(F.col("type") == "InternalIP").select(
        F.col("node_id").alias("src"), F.col("label").alias("internal_label")
    )
    return (
        edges.filter(F.col("rel_type") == "CONNECTED_TO")
        .join(F.broadcast(ext), "dst", "inner")
        .join(F.broadcast(internal), "src", "inner")
        .groupBy("external_ip", "ext_anomaly")
        .agg(
            F.countDistinct("internal_label").alias("internal_hosts_connected"),
            F.slice(F.sort_array(F.collect_set("internal_label")), 1, 5).alias(
                "sample_hosts"
            ),
        )
        .filter(F.col("internal_hosts_connected") > 1)
        .withColumn(
            "risk_status",
            F.when(F.col("ext_anomaly"), "suspicious").otherwise("normal"),
        )
        .drop("ext_anomaly")
        .orderBy(F.desc("internal_hosts_connected"), "external_ip")
        .limit(k)
    )


def timeline(nodes: DataFrame, edges: DataFrame, limit: int | None = None) -> DataFrame:
    """Chronological event reconstruction (CYPHER_QUERIES.md:220-238, W4):
    timestamped connection edges with endpoint labels and a priority CASE on
    the source node's type."""
    labels = nodes.select("node_id", "label", "type")
    src_l = labels.select(
        F.col("node_id").alias("src"),
        F.col("label").alias("source"),
        F.col("type").alias("src_type"),
    )
    dst_l = labels.select(
        F.col("node_id").alias("dst"), F.col("label").alias("destination")
    )
    out = (
        edges.filter(F.col("ts").isNotNull())
        .join(F.broadcast(src_l), "src", "left")
        .join(F.broadcast(dst_l), "dst", "left")
        .select(
            "ts",
            "source",
            "destination",
            "rel_type",
            "port",
            F.when(
                F.col("src_type").isin("Exfiltration", "CommandAndControl"),
                "critical",
            )
            .when(
                F.col("src_type").isin("LateralMovement", "CredentialAccess"), "high"
            )
            .otherwise("medium")
            .alias("priority"),
        )
        .orderBy("ts", "source", "destination")
    )
    return out.limit(limit) if limit else out
