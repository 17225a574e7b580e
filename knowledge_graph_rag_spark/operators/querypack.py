"""The 13-template query pack over materialized nodes/edges tables.

Each function re-expresses one Cypher template from the reference's
safe-template registry (``cypher_query_service.py:87-318``) as a DataFrame
plan over (nodes, edges) frames already filtered to one graph_id — the
``MATCH (g:Graph {id})-[:CONTAINS]->`` prefix of every template becomes
partition pruning on the graph_id partition column (SURVEY.md §4), so callers
pass pre-pruned frames.

All templates end in orderBy+limit → Catalyst plans TakeOrderedAndProject
(distributed top-k, no global sort). The per-IP aggregations shuffle once on
ip; exploit_preparation (A17, the flagship) adds one window for per-IP top-3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_IP_RE = r"\d+\.\d+\.\d+\.\d+"


def _ip_nodes(nodes: DataFrame) -> DataFrame:
    """`ip.type = 'IP' OR ip.label =~ '\\d+...'` prefilter used by most
    templates (cypher_query_service.py:90)."""
    return nodes.filter(
        (F.col("type").isin("IP", "IPAddress", "InternalIP", "ExternalIP"))
        | F.col("label").rlike(_IP_RE)
    )


def _conn_edges(edges: DataFrame) -> DataFrame:
    return edges.filter(F.col("rel_type").isin("CONNECTED_TO", "CONNECTS_TO"))


def _per_ip_conn_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Shared shape of A11/A12/A16: per source-IP distinct ports (nulls → 0),
    connection count, bytes. One shuffle keyed on src."""
    e = _conn_edges(edges).select(
        "src",
        F.coalesce(F.col("port"), F.lit(0)).alias("port"),
        F.coalesce(F.col("bytes"), F.lit(0)).alias("bytes"),
    )
    per_ip = e.groupBy("src").agg(
        F.countDistinct("port").alias("ports_accessed"),
        F.count("*").alias("total_connections"),
        F.sum("bytes").alias("bytes_sent"),
    )
    ips = _ip_nodes(nodes).select(F.col("node_id").alias("src"), F.col("label"))
    return per_ip.join(ips, "src", "inner")


def attacks_detected(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A11 (cypher_query_service.py:88-110): threat-type bucketing of per-IP
    stats, per-bucket affected count + 5 sample IPs."""
    stats = _per_ip_conn_stats(nodes, edges).filter(
        (F.col("ports_accessed") > 5) | (F.col("total_connections") > 50)
    )
    bucketed = stats.withColumn(
        "threat_type",
        F.when(F.col("ports_accessed") > 10, "Port Scanning")
        .when(F.col("ports_accessed") > 5, "Reconnaissance")
        .when(F.col("total_connections") > 100, "High Volume Traffic")
        .otherwise("Suspicious Activity"),
    )
    return (
        bucketed.groupBy("threat_type")
        .agg(
            F.count("label").alias("affected_ips"),
            F.slice(F.sort_array(F.collect_list("label")), 1, 5).alias("sample_ips"),
        )
        .orderBy(F.desc("affected_ips"), "threat_type")
    )


def ip_connections(nodes: DataFrame, edges: DataFrame, ip: str) -> DataFrame:
    """Template ip_connections (:112-123): outgoing edges of one IP."""
    src_nodes = nodes.filter(
        (F.col("label") == ip) | F.col("node_id").contains(ip)
    ).select(F.col("node_id").alias("src"), F.col("label").alias("source_ip"))
    targets = nodes.select(
        F.col("node_id").alias("dst"), F.col("label").alias("destination")
    )
    return (
        edges.join(F.broadcast(src_nodes), "src", "inner")
        .join(targets, "dst", "inner")
        .filter(F.col("destination").isNotNull())
        .select(
            "source_ip",
            F.col("rel_type").alias("connection_type"),
            "destination",
            F.col("bytes").alias("bytes_sent"),
            "port",
        )
        .limit(25)
    )


def anomalies(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A12 (:125-151): per-IP stats + severity/anomaly-type CASE ladders."""
    stats = _per_ip_conn_stats(nodes, edges).filter(
        (F.col("ports_accessed") > 5) | (F.col("total_connections") > 30)
    )
    return (
        stats.select(
            F.col("label").alias("ip_address"),
            F.col("ports_accessed"),
            F.col("total_connections").alias("connections"),
            "bytes_sent",
            F.when(
                (F.col("ports_accessed") > 10) & (F.col("total_connections") > 50),
                "Critical",
            )
            .when(F.col("ports_accessed") > 5, "High")
            .otherwise("Medium")
            .alias("severity"),
            F.when(F.col("ports_accessed") > 10, "Port Scanning + High Volume")
            .when(F.col("ports_accessed") > 5, "Multi-port Access")
            .when(F.col("total_connections") > 50, "High Connection Volume")
            .otherwise("Unusual Activity")
            .alias("anomaly_type"),
        )
        .orderBy(F.desc("ports_accessed"), F.desc("connections"), "ip_address")
        .limit(15)
    )


def top_talkers(nodes: DataFrame, edges: DataFrame, k: int = 10) -> DataFrame:
    """A13 (:153-163): per-IP out-degree + bytes, top-k. IPs with no outgoing
    edges kept at 0 (OPTIONAL MATCH semantics → left join)."""
    per_src = edges.groupBy("src").agg(
        F.count("*").alias("connections"),
        F.sum(F.coalesce(F.col("bytes"), F.lit(0))).alias("bytes_sent"),
    )
    return (
        _ip_nodes(nodes)
        .select(F.col("node_id").alias("src"), F.col("label").alias("ip_address"))
        .join(per_src, "src", "left")
        .select(
            "ip_address",
            F.coalesce(F.col("connections"), F.lit(0)).alias("connections"),
            F.coalesce(F.col("bytes_sent"), F.lit(0)).alias("bytes_sent"),
        )
        .orderBy(F.desc("connections"), "ip_address")
        .limit(k)
    )


def port_analysis(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A14 (:165-181): incoming count per Port node + service CASE."""
    ports = nodes.filter(
        (F.col("type") == "Port") | F.col("label").contains("Port")
    ).select(F.col("node_id").alias("dst"), F.col("label").alias("port"))
    per_port = edges.groupBy("dst").agg(F.count("*").alias("connections"))
    return (
        ports.join(per_port, "dst", "left")
        .select(
            "port",
            F.coalesce(F.col("connections"), F.lit(0)).alias("connections"),
            F.when(F.col("port").contains("22"), "SSH")
            .when(F.col("port").contains("80"), "HTTP")
            .when(F.col("port").contains("443"), "HTTPS")
            .when(F.col("port").contains("3389"), "RDP")
            .otherwise("Other")
            .alias("service"),
        )
        .orderBy(F.desc("connections"), "port")
        .limit(15)
    )


def network_topology(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """U1/A15 (:183-193): node-type counts UNION edge-type counts, top 20."""
    n = nodes.groupBy(F.col("type").alias("node_type")).agg(
        F.count("*").alias("count")
    )
    e = edges.groupBy(
        F.concat(F.lit("Relationship: "), F.col("rel_type")).alias("node_type")
    ).agg(F.count("*").alias("count"))
    return n.unionByName(e).orderBy(F.desc("count"), "node_type").limit(20)


def attack_details(nodes: DataFrame, edges: DataFrame, attack_type: str) -> DataFrame:
    """Template attack_details (:195-205): attack node + up to 5 source IPs."""
    attacks = nodes.filter(
        F.lower(F.col("label")).contains(attack_type.lower())
    ).select(F.col("node_id").alias("dst"), F.col("label").alias("attack"),
             "severity")
    srcs = nodes.select(F.col("node_id").alias("src"), F.col("label").alias("src_label"))
    joined = (
        F.broadcast(attacks)
        .join(edges, "dst", "left")
        .join(srcs, "src", "left")
    )
    return (
        joined.groupBy("attack", "severity")
        .agg(
            F.slice(
                F.sort_array(F.collect_set("src_label")), 1, 5
            ).alias("source_ips"),
            F.count("src").alias("occurrences"),
        )
        .orderBy(F.desc("occurrences"), "attack")
        .limit(10)
    )


def suspicious_ips(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A16 (:207-226)."""
    stats = _per_ip_conn_stats(nodes, edges).filter(
        (F.col("ports_accessed") > 3) | (F.col("total_connections") > 20)
    )
    return (
        stats.select(
            F.col("label").alias("ip_address"),
            "ports_accessed",
            "total_connections",
            F.when(F.col("ports_accessed") > 10, "Port Scanner")
            .when(F.col("ports_accessed") > 5, "Reconnaissance")
            .when(F.col("total_connections") > 50, "High Volume")
            .otherwise("Unusual Pattern")
            .alias("reason"),
        )
        .orderBy(F.desc("ports_accessed"), F.desc("total_connections"), "ip_address")
        .limit(15)
    )


def protocol_analysis(edges: DataFrame) -> DataFrame:
    """Template protocol_analysis (:228-235): usage per protocol."""
    return (
        edges.filter(F.col("protocol").isNotNull())
        .groupBy("protocol")
        .agg(F.count("*").alias("usage"))
        .orderBy(F.desc("usage"), "protocol")
        .limit(10)
    )


def general_overview(nodes: DataFrame) -> DataFrame:
    """Template general (:237-243): per-type count + 5 example labels."""
    return (
        nodes.groupBy("type")
        .agg(
            F.slice(F.sort_array(F.collect_set("label")), 1, 5).alias("examples"),
            F.count("*").alias("count"),
        )
        .orderBy(F.desc("count"), "type")
        .limit(10)
    )


def port_scanners(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Template port_scanners (:245-261): >5 distinct ports, 10 sample ports."""
    e = _conn_edges(edges).select("src", F.coalesce(F.col("port"), F.lit(0)).alias("port"))
    per_ip = e.groupBy("src").agg(
        F.countDistinct("port").alias("ports_accessed"),
        F.count("*").alias("total_connections"),
        F.slice(F.sort_array(F.collect_set("port")), 1, 10).alias("sample_ports"),
    )
    ips = _ip_nodes(nodes).select(F.col("node_id").alias("src"), F.col("label"))
    return (
        per_ip.join(ips, "src", "inner")
        .filter(F.col("ports_accessed") > 5)
        .select(
            F.col("label").alias("source_ip"),
            "ports_accessed",
            "total_connections",
            "sample_ports",
            F.lit("Port Scanner").alias("behavior_type"),
        )
        .orderBy(F.desc("ports_accessed"), "source_ip")
        .limit(15)
    )


def multi_stage_attackers(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Template multi_stage (:263-280): >5 ports AND >50 connections."""
    stats = _per_ip_conn_stats(nodes, edges).filter(
        (F.col("ports_accessed") > 5) & (F.col("total_connections") > 50)
    )
    return (
        stats.select(
            F.col("label").alias("ip_address"),
            "ports_accessed",
            "total_connections",
            "bytes_sent",
            F.lit("Multi-Stage Attacker").alias("threat_type"),
            F.lit("Reconnaissance + Flooding").alias("attack_pattern"),
        )
        .orderBy(F.desc("ports_accessed"), F.desc("total_connections"), "ip_address")
        .limit(10)
    )


def exploit_preparation(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A17, the flagship template (:282-317): per-(ip,port) counts → per-ip
    distinct ports / total conns → top-3 ports by count (window) →
    focus_ratio = round2(top3/total) ≥ 0.5 → threat-level CASE → top 10.

    Physical shape: one shuffle for the (ip,port) agg, one for the per-ip
    window — the collect of {port,count} structs only happens on rows that
    survived the ≥10-port filter, so hub-IP skew is bounded by the filter.
    """
    e = _conn_edges(edges).select(
        "src", F.coalesce(F.col("port"), F.lit(0)).alias("port")
    )
    ip_port = e.groupBy("src", "port").agg(F.count("*").alias("port_count"))
    per_ip = (
        ip_port.groupBy("src")
        .agg(
            F.countDistinct("port").alias("distinct_ports"),
            F.sum("port_count").alias("total_connections"),
        )
        .filter((F.col("distinct_ports") >= 10) & (F.col("total_connections") >= 20))
    )
    # top-3 ports per surviving ip (W1): window over the ip_port rows
    w = Window.partitionBy("src").orderBy(F.desc("port_count"), F.asc("port"))
    top3 = (
        ip_port.join(per_ip.select("src"), "src", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("src")
        .agg(
            F.sum("port_count").alias("top_3_count"),
            F.collect_list(F.struct("port", F.col("port_count").alias("count"))).alias(
                "top_3_ports"
            ),
        )
    )
    ips = _ip_nodes(nodes).select(F.col("node_id").alias("src"), F.col("label"))
    return (
        per_ip.join(top3, "src")
        .join(ips, "src", "inner")
        .withColumn(
            "port_focus_ratio",
            F.round(F.lit(100.0) * F.col("top_3_count") / F.col("total_connections"))
            / 100.0,
        )
        .filter(F.col("port_focus_ratio") >= 0.5)
        .select(
            F.col("label").alias("ip_address"),
            F.col("distinct_ports").alias("ports_scanned"),
            "total_connections",
            F.col("top_3_ports").alias("focused_targets"),
            "port_focus_ratio",
            F.when(F.col("port_focus_ratio") >= 0.8, "Critical - Highly Focused")
            .when(F.col("port_focus_ratio") >= 0.6, "High - Targeted Attack")
            .otherwise("Medium - Recon-to-Exploit")
            .alias("threat_level"),
            F.lit("Recon-to-Exploit Pattern").alias("attack_type"),
        )
        .orderBy(F.desc("port_focus_ratio"), F.desc("ports_scanned"), "ip_address")
        .limit(10)
    )


TEMPLATES = {
    "attacks_detected": attacks_detected,
    "anomalies": anomalies,
    "top_talkers": top_talkers,
    "port_analysis": port_analysis,
    "network_topology": network_topology,
    "suspicious_ips": suspicious_ips,
    "protocol_analysis": lambda nodes, edges: protocol_analysis(edges),
    "general": lambda nodes, edges: general_overview(nodes),
    "port_scanners": port_scanners,
    "multi_stage_attackers": multi_stage_attackers,
    "exploit_preparation": exploit_preparation,
}
