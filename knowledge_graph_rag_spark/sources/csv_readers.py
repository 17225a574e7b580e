"""CSV ingestion with format sniffing (SURVEY.md §2.1 S1-S6).

Reference: ``auto_processor.py:46-519``. The sniff reads two lines driver-side
(exactly like the reference); the convert is a declarative per-format plan —
explicit schema scan + column casts + deterministic derived columns. The
reference's ``datetime.now()`` base time and ``random`` IP synthesis are
replaced with a fixed epoch and hash-of-row arithmetic so runs are
reproducible and oracle-comparable (FIXTURES.md preamble).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..vocab import COLUMN_ALIASES, SERVICE_PORTS

UNSW_NB15_COLUMNS = [
    "srcip", "sport", "dstip", "dsport", "proto", "state", "dur",
    "sbytes", "dbytes", "sttl", "dttl", "sloss", "dloss", "service",
    "Sload", "Dload", "Spkts", "Dpkts", "swin", "dwin", "stcpb", "dtcpb",
    "smeansz", "dmeansz", "trans_depth", "res_bdy_len", "Sjit", "Djit",
    "Stime", "Ltime", "Sintpkt", "Dintpkt", "tcprtt", "synack", "ackdat",
    "is_sm_ips_ports", "ct_state_ttl", "ct_flw_http_mthd", "is_ftp_login",
    "ct_ftp_cmd", "ct_srv_src", "ct_srv_dst", "ct_dst_ltm", "ct_src_ltm",
    "ct_src_dport_ltm", "ct_dst_sport_ltm", "ct_dst_src_ltm",
    "attack_cat", "Label",
]

FIXED_EPOCH = "2026-01-01 00:00:00"


def _looks_like_ip(value: str) -> bool:
    """auto_processor.py:106-115."""
    value = value.strip().lstrip("﻿")
    parts = value.split(".")
    if len(parts) != 4:
        return False
    try:
        return all(0 <= int(p) <= 255 for p in parts)
    except ValueError:
        return False


def detect_dataset_format(csv_path: str) -> tuple[str, list[str]]:
    """S1 sniff (auto_processor.py:46-103): peek 2 lines, classify."""
    with open(csv_path, encoding="utf-8-sig", errors="ignore") as f:
        first = f.readline().strip()
        second = f.readline().strip()
    first_values = first.split(",")
    second_values = second.split(",")
    if first_values:
        first_values[0] = first_values[0].strip().lstrip("﻿")
    if len(first_values) >= 45 and _looks_like_ip(first_values[0]):
        return "unsw_nb15", UNSW_NB15_COLUMNS
    lower = [h.lower().strip() for h in first_values]
    if "destination port" in lower:
        return "cicids2017", first_values
    if "srcip" in lower:
        return "unsw_nb15", first_values
    if "attack_cat" in lower and "label" in lower and "id" in lower:
        return "unsw_nb15_preprocessed", first_values
    if len(second_values) >= 45 and _looks_like_ip(second_values[0]):
        return "unsw_nb15", UNSW_NB15_COLUMNS
    return "unknown", first_values


def _row_index(df: DataFrame) -> DataFrame:
    """Deterministic 0-based row index in file order (replacement for the
    reference's enumerate()).

    Scale note: the global window is a single-partition sort — acceptable ONLY
    because every CSV reader is bounded by the reference's own max_rows cap
    (≤5000, auto_processor.py:119,531,866). An uncapped ingest would instead
    derive the index from (file, offset) via input_file_name + a per-file
    running count, or make timestamps a function of content hash."""
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn("_i", F.row_number().over(w) - 1)


def _with_timestamp(df: DataFrame) -> DataFrame:
    """base_time + i seconds with a FIXED epoch (auto_processor.py:218,
    determinism per FIXTURES.md)."""
    return df.withColumn(
        "timestamp",
        F.to_timestamp(F.lit(FIXED_EPOCH)) + F.make_interval(secs=F.col("_i")),
    )


def _attack_cols(df: DataFrame, attack_col: str, label_col: str) -> DataFrame:
    """P5 attack labelling (auto_processor.py:213-232)."""
    attack = F.trim(F.coalesce(F.col(attack_col), F.lit("")))
    is_attack = (F.col(label_col).cast("string") == "1") | (
        (attack != "") & ~attack.isin("Normal", "-", " ")
    )
    return df.withColumn(
        "action", F.when(is_attack, "deny").otherwise("allow")
    ).withColumn(
        "attack_type",
        F.when(is_attack & (attack != "") & ~attack.isin("-", " ", "Normal"), attack),
    )


def read_unsw_nb15(spark: SparkSession, path: str, max_rows: int = 5000) -> DataFrame:
    """S3 (auto_processor.py:142-300): headerless 49-col layout or with-header
    variant; tolerant numeric casts with the reference's fallback defaults."""
    fmt, cols = detect_dataset_format(path)
    has_header = fmt != "unsw_nb15" or cols != UNSW_NB15_COLUMNS
    if has_header:
        df = spark.read.csv(path, header=True)
        df = df.toDF(*[c.lower().strip() for c in df.columns])
    else:
        df = spark.read.csv(path, header=False).toDF(*[c.lower() for c in UNSW_NB15_COLUMNS])
    df = _row_index(df.limit(max_rows))
    df = df.filter(
        F.col("srcip").isNotNull() & F.col("dstip").isNotNull()
        & F.trim("srcip").rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    )
    num = lambda c, d: F.coalesce(F.col(c).try_cast("double").try_cast("long"), F.lit(d))  # noqa: E731
    df = (
        df.withColumn("source_ip", F.trim("srcip"))
        .withColumn("dest_ip", F.trim("dstip"))
        .withColumn("source_port", num("sport", 0).cast("int"))
        .withColumn(
            "dest_port",
            F.coalesce(F.col("dsport").try_cast("double").try_cast("int"), F.lit(80)),
        )
        .withColumn("protocol", F.upper(F.coalesce(F.col("proto"), F.lit("TCP"))))
        .withColumn("bytes_sent", num("sbytes", 0))
        .withColumn("bytes_received", num("dbytes", 0))
        .withColumn("duration", F.coalesce((F.col("dur")).try_cast("double"), F.lit(0.0)))
    )
    df = _with_timestamp(df)
    df = _attack_cols(df, "attack_cat", "label")
    return df.select(
        "timestamp", "source_ip", "dest_ip", "source_port", "dest_port",
        "protocol", "bytes_sent", "bytes_received", "duration", "action",
        F.lit(None).cast("string").alias("user"), "attack_type",
    )


def read_unsw_preprocessed(spark: SparkSession, path: str, max_rows: int = 5000) -> DataFrame:
    """S4 (auto_processor.py:303-406): no IPs in data → deterministic synthetic
    IPs from the row id (id_to_ip modular arithmetic :312-326) — pure column
    expressions, no UDF."""
    df = spark.read.csv(path, header=True)
    df = df.toDF(*[c.lower().strip() for c in df.columns])
    df = _row_index(df.limit(max_rows))
    rid = F.coalesce((F.col("id")).try_cast("long"), F.col("_i")).alias("rid")
    df = df.withColumn("rid", rid)
    r = F.col("rid")
    src_ip = F.when(
        r % 2 == 0,
        F.concat(F.lit("192.168."), ((r / 256).cast("long") % 256).cast("string"),
                 F.lit("."), (r % 256).cast("string")),
    ).otherwise(
        F.concat(F.lit("10."), ((r / 65536).cast("long") % 256).cast("string"),
                 F.lit("."), ((r / 256).cast("long") % 256).cast("string"),
                 F.lit("."), (r % 256).cast("string"))
    )
    dst_ip = F.when(
        r % 5 == 0,
        F.concat((59 + r % 100).cast("string"), F.lit("."),
                 ((r / 256).cast("long") % 256).cast("string"), F.lit("."),
                 (r % 256).cast("string"), F.lit("."),
                 ((r * 7) % 256).cast("string")),
    ).otherwise(
        F.concat(F.lit("192.168."), ((r / 100).cast("long") % 256).cast("string"),
                 F.lit("."), ((r * 3) % 256).cast("string"))
    )
    service_port = F.create_map(
        *[F.lit(x) for kv in SERVICE_PORTS.items() for x in kv]
    )[F.lower(F.coalesce(F.col("service"), F.lit("-")))]
    df = (
        df.withColumn("source_ip", src_ip)
        .withColumn("dest_ip", dst_ip)
        .withColumn("source_port", (1024 + r % 60000).cast("int"))
        .withColumn(
            "dest_port",
            F.coalesce(service_port, (80 + r % 1000).cast("int")),
        )
        .withColumn("protocol", F.upper(F.coalesce(F.col("proto"), F.lit("tcp"))))
        .withColumn("bytes_sent", F.coalesce(((F.col("sbytes")).try_cast("double")).try_cast("long"), F.lit(0)))
        .withColumn("bytes_received", F.coalesce(((F.col("dbytes")).try_cast("double")).try_cast("long"), F.lit(0)))
        .withColumn("duration", F.coalesce((F.col("dur")).try_cast("double"), F.lit(0.0)))
    )
    df = _with_timestamp(df)
    df = _attack_cols(df, "attack_cat", "label")
    return df.select(
        "timestamp", "source_ip", "dest_ip", "source_port", "dest_port",
        "protocol", "bytes_sent", "bytes_received", "duration", "action",
        F.lit(None).cast("string").alias("user"), "attack_type",
    )


#: the reference's fixed internal-server pool (auto_processor.py:422)
CICIDS_INTERNAL_SERVERS = [
    "192.168.1.10", "192.168.1.20", "192.168.1.100", "10.0.0.5", "10.0.0.10",
]


def read_cicids2017(spark: SparkSession, path: str, max_rows: int = 5000) -> DataFrame:
    """S5 (auto_processor.py:409-477): header-based CICIDS2017 reader with
    attack-aware IP synthesis.

    The reference draws missing IPs from ``random`` per attack label
    (DDoS/DoS → any public /8, PortScan → 45.33.0.0/16, Bot → 185.0.0.0/8,
    Brute Force → 185.220.0.0/16, BENIGN → 192.168.1.10-99 → internal
    servers). Per SURVEY.md S5, every ``random`` call is replaced by
    hash-of-row arithmetic (xxhash64(_i, salt)) — same patterns and ranges,
    bit-reproducible across runs. All column expressions, no UDF."""
    df = spark.read.csv(path, header=True)
    df = df.toDF(*[c.lower().strip() for c in df.columns])
    present = set(df.columns)
    df = _row_index(df.limit(max_rows))

    def h(salt: str):
        # deterministic stand-in for one random.randint draw
        return F.abs(F.xxhash64(F.col("_i"), F.lit(salt)))

    def o(salt: str, lo: int, hi: int):  # inclusive range, as string
        return (F.lit(lo) + h(salt) % (hi - lo + 1)).cast("string")

    def col_or_null(name: str):
        return F.trim(F.col(name)) if name in present else F.lit(None).cast("string")

    label = F.coalesce(
        F.nullif(col_or_null("label"), F.lit("")), F.lit("BENIGN")
    )
    ll = F.lower(label)
    raw_src = F.nullif(col_or_null("source ip"), F.lit(""))
    raw_dst = F.nullif(col_or_null("destination ip"), F.lit(""))

    rand_public = F.concat_ws(
        ".", o("a", 1, 223), o("b", 1, 254), o("c", 1, 254), o("d", 1, 254)
    )
    # dict-order match, exactly like the reference loop (DDoS before DoS)
    synth_src = (
        F.when(label == "BENIGN",
               F.concat(F.lit("192.168.1."), o("ben", 10, 99)))
        .when(ll.contains("ddos"), rand_public)
        .when(ll.contains("dos"), rand_public)
        .when(ll.contains("portscan"),
              F.concat(F.lit("45.33."), o("p1", 1, 254), F.lit("."), o("p2", 1, 254)))
        .when(ll.contains("bot"),
              F.concat(F.lit("185."), o("b1", 1, 254), F.lit("."),
                       o("b2", 1, 254), F.lit("."), o("b3", 1, 254)))
        .when(ll.contains("brute force"),
              F.concat(F.lit("185.220."), o("bf1", 1, 254), F.lit("."), o("bf2", 1, 254)))
        .otherwise(rand_public)
    )
    servers = F.array(*[F.lit(s) for s in CICIDS_INTERNAL_SERVERS])
    synth_dst = F.get(servers, (h("dsrv") % 5).cast("int"))
    need_synth = raw_src.isNull() | raw_dst.isNull()

    is_attack = label != "BENIGN"
    out = (
        df.withColumn("source_ip", F.when(need_synth, synth_src).otherwise(raw_src))
        .withColumn("dest_ip", F.when(need_synth, synth_dst).otherwise(raw_dst))
        .withColumn("source_port", F.lit(0))  # absent in CICIDS logs (reference omits the key)
        .withColumn(
            "dest_port",
            F.coalesce(
                col_or_null("destination port").try_cast("double").cast("int"),
                F.lit(80),
            ),
        )
        .withColumn("protocol", F.lit("TCP"))
        .withColumn("bytes_sent", (F.lit(100) + h("bs") % 4901))
        .withColumn("bytes_received", (F.lit(100) + h("br") % 4901))
        .withColumn("duration", F.lit(0.1) + (h("dur") % 9900) / F.lit(1000.0))
        .withColumn("action", F.when(is_attack, "deny").otherwise("allow"))
        .withColumn("attack_type", F.when(is_attack, label))
    )
    out = _with_timestamp(out)
    return out.select(
        "timestamp", "source_ip", "dest_ip", "source_port", "dest_port",
        "protocol", "bytes_sent", "bytes_received", "duration", "action",
        F.lit(None).cast("string").alias("user"), "attack_type",
    )


def read_generic(spark: SparkSession, path: str, max_rows: int = 5000) -> DataFrame:
    """S6 (auto_processor.py:480-519): header-based reader with column-name
    aliasing (source_ip/src_ip/srcip/...) via coalesce over present aliases."""
    df = spark.read.csv(path, header=True)
    df = df.toDF(*[c.lower().strip() for c in df.columns])
    present = set(df.columns)
    df = _row_index(df.limit(max_rows))

    def pick(target: str):
        cands = [F.col(a) for a in COLUMN_ALIASES[target] if a in present]
        return F.coalesce(*cands) if cands else F.lit(None).cast("string")

    out = (
        df.withColumn("source_ip", pick("source_ip"))
        .withColumn("dest_ip", pick("dest_ip"))
        .withColumn("source_port", (pick("source_port")).try_cast("int"))
        .withColumn("dest_port", (pick("dest_port")).try_cast("int"))
        .withColumn("protocol", F.upper(F.coalesce(pick("protocol"), F.lit("TCP"))))
        .withColumn("bytes_sent", F.coalesce((pick("bytes_sent")).try_cast("long"), F.lit(0)))
        .withColumn("bytes_received", F.coalesce((pick("bytes_received")).try_cast("long"), F.lit(0)))
        .withColumn("duration", F.coalesce((pick("duration")).try_cast("double"), F.lit(0.0)))
        .withColumn("attack_type", pick("attack_type"))
    )
    out = _with_timestamp(out)
    return out.select(
        "timestamp", "source_ip", "dest_ip", "source_port", "dest_port",
        "protocol", "bytes_sent", "bytes_received", "duration",
        F.lit("allow").alias("action"),
        F.lit(None).cast("string").alias("user"), "attack_type",
    ).filter(F.col("source_ip").isNotNull() & F.col("dest_ip").isNotNull())


def convert_csv_to_logs(spark: SparkSession, path: str, max_rows: int = 5000) -> DataFrame:
    """Dispatch on sniffed format (auto_processor.py:119-139)."""
    fmt, _ = detect_dataset_format(path)
    if fmt == "unsw_nb15":
        return read_unsw_nb15(spark, path, max_rows)
    if fmt == "unsw_nb15_preprocessed":
        return read_unsw_preprocessed(spark, path, max_rows)
    if fmt == "cicids2017":
        return read_cicids2017(spark, path, max_rows)
    return read_generic(spark, path, max_rows)
