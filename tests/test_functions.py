"""Unit-test vectors carried over from the reference tests (FIXTURES.md F6:
internal-IP truth table, service map, suspicious ports, normalize_key)."""

from pyspark.sql import functions as F

from knowledge_graph_rag_spark.functions import net
from knowledge_graph_rag_spark.functions.text import (
    clean_text_col,
    language_scores_cols,
    sentences_col,
    word_tokens_col,
)


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema=schema)
    return [r.out for r in df.select(col.alias("out")).collect()]


def test_internal_ip_truth_table(spark):
    # test_comprehensive.py:48-56
    rows = [("192.168.1.10",), ("10.0.0.5",), ("172.16.0.1",), ("172.32.0.1",),
            ("8.8.8.8",), ("1.1.1.1",), ("127.0.0.1",), ("not-an-ip",)]
    out = _eval(spark, net.is_internal_ip(F.col("ip")), rows, "ip string")
    assert out == [True, True, True, False, False, False, True, False]


def test_service_map(spark):
    # test_comprehensive.py:58-65
    rows = [(80,), (443,), (22,), (21,), (9999,)]
    out = _eval(spark, net.service_name(F.col("p")), rows, "p int")
    assert out == ["HTTP", "HTTPS", "SSH", "FTP", "Port-9999"]


def test_suspicious_ports(spark):
    # test_comprehensive.py:67-74 + ephemeral rule network_parser.py:70-72
    rows = [(4444,), (31337,), (80,), (443,), (50000,), (49152,), (49153,)]
    out = _eval(spark, net.is_suspicious_port(F.col("p")), rows, "p int")
    assert out == [True, True, False, False, True, False, False]


def test_normalize_key(spark):
    # graph_merger.py:204-240 strategies
    rows = [
        ("192.168.1.10", "InternalIP", "ip:192.168.1.10"),
        ("SSH (22)", "Port", "port:22"),
        ("tcp", "Protocol", "protocol:TCP"),
        ("Workstation WS-23", "Device", "device:ws-23"),
        ("WS-23", "Device", "device:ws-23"),
        ("Acme Corp", "Organization", "organization:acme corp"),
    ]
    df = spark.createDataFrame(rows, "label string, type string, expected string")
    got = df.select(
        net.normalize_key(F.col("label"), F.col("type")).alias("out"), "expected"
    ).collect()
    for r in got:
        assert r.out == r.expected, (r.out, r.expected)


def test_node_ids(spark):
    rows = [("192.168.1.10", "InternalIP"), ("SSH (22)", "Port"), ("DoS Attack", "Attack")]
    df = spark.createDataFrame(rows, "label string, type string")
    out = [r.out for r in df.select(net.entity_node_id(F.col("label"), F.col("type")).alias("out")).collect()]
    assert out[0] == "ip_192_168_1_10"
    assert out[1] == "port_22"
    assert out[2] == "attack_dos_attack"


def test_clean_and_sentences(spark):
    rows = [("  Hello   world. This\x00 is\tfine!  ",)]
    cleaned = _eval(spark, clean_text_col(F.col("t")), rows, "t string")
    assert cleaned == ["Hello world. This is fine!"]
    sents = _eval(spark, sentences_col(clean_text_col(F.col("t"))), rows, "t string")
    assert sents == [["Hello world.", "This is fine!"]]


def test_language_scores(spark):
    rows = [("the cat and the dog that have fur",)]
    df = spark.createDataFrame(rows, "t string")
    out = df.select(*language_scores_cols(word_tokens_col(F.col("t")))).collect()[0]
    assert out.score_en == 5  # the, and, the, that, have
    assert out.score_es <= 1


def test_truncate_smart(spark):
    from knowledge_graph_rag_spark.functions.text import truncate_smart_col

    long_text = ("A sentence here. " * 100).strip()  # 1699 chars
    rows = [(long_text,), ("short text.",)]
    out = _eval(spark, truncate_smart_col(F.col("t"), 500), rows, "t string")
    # truncated at last '.' past 80% of 500, with ellipsis
    assert out[0].endswith("....") or out[0].endswith("here....") is False
    assert out[0].endswith("...")
    body = out[0][:-3]
    assert body.endswith(".") and 400 <= len(body) <= 500
    assert out[1] == "short text."  # untouched


def test_remove_boilerplate(spark):
    from knowledge_graph_rag_spark.functions.text import remove_boilerplate_col

    rows = [("Useful content. Copyright 2024 Acme. more tail",),
            ("Body text Page 3 of 10 continues",)]
    out = _eval(spark, remove_boilerplate_col(F.col("t")), rows, "t string")
    assert out[0] == "Useful content."
    assert out[1] == "Body text  continues".replace("  ", " ") or "Page" not in out[1]
