"""Network-log ingestion: parse, derive, anomaly-score (SURVEY.md §2.2/§2.5).

The reference's per-row Python loops (``network_parser.py:83-134``,
``anomaly_detector.py:149-240``) become one declarative DataFrame transform:
every derivation is a native Column expression, so the whole parse+score path
stays inside whole-stage codegen with zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.net import is_internal_ip, is_suspicious_port, service_name


def parse_logs(logs: DataFrame) -> DataFrame:
    """Log entries → connections (network_parser.py:108-134).

    Drops rows missing (source_ip, dest_ip, dest_port); casts/defaults match
    the reference: protocol upper w/ TCP default, bytes/duration null→0.
    conn_id is a deterministic content hash (replaces the reference's
    ``uuid.uuid4()`` so re-runs are idempotent — identical log rows collapse
    to one connection, which downstream dedup would do anyway).
    """
    c = logs.filter(
        F.col("source_ip").isNotNull()
        & F.col("dest_ip").isNotNull()
        & F.col("dest_port").isNotNull()
    )
    c = c.select(
        F.sha2(
            F.concat_ws(
                "|",
                F.col("timestamp").cast("string"),
                "source_ip", "dest_ip", "source_port", "dest_port",
                "protocol", "bytes_sent", "bytes_received", "duration",
            ),
            256,
        ).alias("conn_id"),
        "source_ip",
        "dest_ip",
        F.col("source_port").cast("int").alias("source_port"),
        F.col("dest_port").cast("int").alias("dest_port"),
        F.upper(F.coalesce(F.col("protocol"), F.lit("TCP"))).alias("protocol"),
        "timestamp",
        F.coalesce(F.col("bytes_sent"), F.lit(0)).cast("long").alias("bytes_sent"),
        F.coalesce(F.col("bytes_received"), F.lit(0)).cast("long").alias("bytes_received"),
        F.coalesce(F.col("duration"), F.lit(0.0)).cast("double").alias("duration"),
        F.coalesce(F.col("action"), F.lit("allow")).alias("action"),
        "user",
        "attack_type",
    )
    return (
        c.withColumn("source_is_internal", is_internal_ip(F.col("source_ip")))
        .withColumn("dest_is_internal", is_internal_ip(F.col("dest_ip")))
        .withColumn("service", service_name(F.col("dest_port")))
        .withColumn("is_suspicious_port", is_suspicious_port(F.col("dest_port")))
    )


def score_connections(conns: DataFrame) -> DataFrame:
    """Rule-based anomaly scoring as native columns — the reference's own
    fallback path (anomaly_detector.py:187-240): builds ``anomaly_types``
    (array<string>), ``anomaly_score`` = min(0.25·n, 1.0), ``is_anomaly``.

    Rules (anomaly_detector.py:201-240): suspicious port; internal→external to
    a known-malware port; >10 MB external transfer; unusual hour (02-05);
    ephemeral port >49152 on TCP/UDP.
    """
    ext = F.col("source_is_internal") & ~F.col("dest_is_internal")
    port = F.col("dest_port")
    hour = F.hour("timestamp")
    rules = F.array_compact(
        F.array(
            F.when(
                F.col("is_suspicious_port"),
                F.concat(F.lit("suspicious_port:"), port.cast("string")),
            ),
            F.when(
                ext & port.isin(4444, 5555, 6666, 31337),
                F.concat(F.lit("known_malware_port:"), port.cast("string")),
            ),
            F.when(
                ext & (F.col("bytes_sent") > 10_000_000),
                F.concat(
                    F.lit("large_external_transfer:"),
                    F.col("bytes_sent").cast("string"),
                    F.lit("bytes"),
                ),
            ),
            F.when(
                (hour >= 2) & (hour <= 5), F.lit("unusual_time:score=1.00")
            ),
            F.when(
                F.col("protocol").isin("TCP", "UDP")
                & (port > 49152)
                & ~port.isin(49152, 49153),
                F.concat(F.lit("high_ephemeral_port:"), port.cast("string")),
            ),
        )
    )
    n = F.size(F.col("anomaly_types"))
    return (
        conns.withColumn("anomaly_types", rules)
        .withColumn("anomaly_score", F.least(n * F.lit(0.25), F.lit(1.0)))
        .withColumn("is_anomaly", n > 0)
    )


def analyze_summary(scored: DataFrame) -> DataFrame:
    """Anomaly summary rollup (anomaly_detector.py:242-285, A5) — one row:
    total, anomalies, percentage."""
    return scored.agg(
        F.count("*").alias("total_connections"),
        F.sum(F.col("is_anomaly").cast("long")).alias("anomalies_detected"),
        (
            F.sum(F.col("is_anomaly").cast("double")) * 100.0 / F.count("*")
        ).alias("anomaly_percentage"),
    )


def anomaly_type_counts(scored: DataFrame) -> DataFrame:
    """Counts per anomaly type (explode of the rules array)."""
    return (
        scored.filter("is_anomaly")
        .select(F.explode("anomaly_types").alias("anomaly_type"))
        .groupBy("anomaly_type")
        .count()
        .orderBy(F.desc("count"), "anomaly_type")
    )


def top_suspicious_ips(scored: DataFrame, k: int = 10) -> DataFrame:
    """Per-IP total_score + anomaly_count, top-k by score
    (anomaly_detector.py:262-277). TakeOrderedAndProject — distributed top-k."""
    return (
        scored.groupBy(F.col("source_ip").alias("ip"))
        .agg(
            F.sum("anomaly_score").alias("total_score"),
            F.sum(F.col("is_anomaly").cast("long")).alias("anomaly_count"),
        )
        .orderBy(F.desc("total_score"), "ip")
        .limit(k)
    )


def detect_port_scan(conns: DataFrame, threshold: int = 10) -> DataFrame:
    """Port-scan detection (network_parser.py:270-306, A2): per (src,dst)
    distinct dest ports ≥ threshold; first-20 sorted ports; confidence
    min(n/threshold, 1). collect_set shuffles once on the composite key."""
    return (
        conns.groupBy(
            F.col("source_ip").alias("scanner_ip"),
            F.col("dest_ip").alias("target_ip"),
        )
        .agg(F.collect_set("dest_port").alias("port_set"))
        .withColumn("ports_scanned", F.size("port_set"))
        .filter(F.col("ports_scanned") >= threshold)
        .select(
            "scanner_ip",
            "target_ip",
            "ports_scanned",
            F.slice(F.array_sort("port_set"), 1, 20).alias("ports"),
            F.lit(True).alias("is_scan"),
            F.least(
                F.col("ports_scanned") / F.lit(float(threshold)), F.lit(1.0)
            ).alias("confidence"),
        )
    )


def detect_data_exfiltration(conns: DataFrame, byte_threshold: int = 100_000_000) -> DataFrame:
    """Exfiltration rollup (network_parser.py:309-345, A3): internal→external,
    per-source sum(bytes_sent) ≥ threshold."""
    return (
        conns.filter(F.col("source_is_internal") & ~F.col("dest_is_internal"))
        .groupBy(F.col("source_ip"))
        .agg(
            F.sum("bytes_sent").alias("total_bytes"),
            F.countDistinct("dest_ip").alias("unique_destinations"),
            F.count("*").alias("connection_count"),
        )
        .filter(F.col("total_bytes") >= byte_threshold)
        .withColumn("is_suspicious", F.lit(True))
    )


def ip_statistics(conns: DataFrame, approximate: bool = False) -> DataFrame:
    """Per-IP traffic stats (network_parser.py:136-179, A1): outgoing /
    incoming counts, distinct dests/ports, bytes — two partial aggs unioned
    then re-agged (map-side combine on both branches).

    ``approximate=True`` swaps exact countDistinct for HyperLogLog
    (approx_count_distinct, default rsd 5%) — the 100 TB path: exact distinct
    counts need a per-key dedup shuffle of every (ip, dest) pair; HLL sketches
    merge map-side in constant space."""
    cd = F.approx_count_distinct if approximate else F.countDistinct
    out = conns.groupBy(F.col("source_ip").alias("ip")).agg(
        F.count("*").alias("outgoing_connections"),
        cd("dest_ip").alias("unique_destinations"),
        cd("dest_port").alias("unique_ports_accessed"),
        F.sum("bytes_sent").alias("total_bytes_sent"),
        F.lit(0).cast("long").alias("incoming_connections"),
    )
    inc = conns.groupBy(F.col("dest_ip").alias("ip")).agg(
        F.lit(0).cast("long").alias("outgoing_connections"),
        F.lit(0).cast("long").alias("unique_destinations"),
        F.lit(0).cast("long").alias("unique_ports_accessed"),
        F.lit(0).cast("long").alias("total_bytes_sent"),
        F.count("*").alias("incoming_connections"),
    )
    return (
        out.unionByName(inc)
        .groupBy("ip")
        .agg(
            F.sum("outgoing_connections").alias("outgoing_connections"),
            F.sum("incoming_connections").alias("incoming_connections"),
            F.sum("unique_destinations").alias("unique_destinations"),
            F.sum("unique_ports_accessed").alias("unique_ports_accessed"),
            F.sum("total_bytes_sent").alias("total_bytes_sent"),
        )
        .withColumn("is_internal", is_internal_ip(F.col("ip")))
    )
