"""functions/pii.py — pattern truth table, redaction semantics, nesting order."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_rag_spark.functions.pii import (
    PII_PATTERNS,
    pii_count_cols,
    pii_doc_cols,
    redact_pii_col,
)

CASES = [
    # (text, expected per-class counts, expected redacted)
    (
        "reach me at jane.doe+spam@corp.example.org today",
        {"email": 1},
        "reach me at <EMAIL> today",
    ),
    (
        "card 4111-1111-1111-1234 and 4111 1111 1111 9999 were used",
        {"card": 2},
        "card <CARD> and <CARD> were used",
    ),
    ("ssn is 123-45-6789.", {"ssn": 1}, "ssn is <SSN>."),
    ("call +44 207 946 0958 now", {"phone": 1}, "call <PHONE> now"),
    ("host 192.168.0.1 and 10.0.0.255", {"ipv4": 2}, "host <IPV4> and <IPV4>"),
    # multi-class in one doc
    (
        "a@b.io or +1-555-123-4567 or 8.8.8.8",
        {"email": 1, "phone": 1, "ipv4": 1},
        "<EMAIL> or <PHONE> or <IPV4>",
    ),
    # negatives: version strings, plain numbers, @-handles without TLD
    ("version 1.2.3 of pkg @home build 12345", {}, "version 1.2.3 of pkg @home build 12345"),
    # SSN shape must NOT fire inside a card number; card redacts first
    (
        "pay 4111-1111-1111-1234 ref 999-88-7777",
        {"card": 1, "ssn": 1},
        "pay <CARD> ref <SSN>",
    ),
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "i int, text string"
    )
    out = df.withColumns(pii_doc_cols(F.col("text"))).collect()
    return {r["i"]: r for r in out}


def test_pii_counts_truth_table(scored):
    for i, (_, expected, _) in enumerate(CASES):
        r = scored[i]
        for cls in PII_PATTERNS:
            assert r[f"pii_{cls}"] == expected.get(cls, 0), (i, cls)
        assert r["pii_total"] == sum(expected.values())
        assert r["has_pii"] == (sum(expected.values()) > 0)


def test_pii_redaction_truth_table(scored):
    for i, (_, _, expected_red) in enumerate(CASES):
        assert scored[i]["redacted_text"] == expected_red, i


def test_redaction_is_idempotent(spark):
    df = spark.createDataFrame(
        [(t,) for t, _, _ in CASES], "text string"
    ).select(redact_pii_col(F.col("text")).alias("r1"))
    out = df.select(
        "r1", redact_pii_col(F.col("r1")).alias("r2")
    ).collect()
    for r in out:
        assert r["r1"] == r["r2"]


def test_count_cols_match_redaction_replacements(spark):
    """Per class: number of matches counted == number of tokens that appear
    after redacting that class alone (cross-check of count vs replace)."""
    df = spark.createDataFrame([(t,) for t, _, _ in CASES], "text string")
    counts = pii_count_cols(F.col("text"))
    for cls, (pat, tok) in PII_PATTERNS.items():
        got = df.select(
            counts[cls].alias("n"),
            (
                (F.length(F.regexp_replace(F.col("text"), pat, tok))
                 - F.length(F.regexp_replace(F.col("text"), pat, "")))
                / F.lit(len(tok))
            ).cast("long").alias("n_tokens"),
        ).collect()
        for r in got:
            assert r["n"] == r["n_tokens"], cls


def test_url_domains_and_blocklist(spark):
    """Domain extraction truth table (lowercasing, multiple URLs, no-URL
    docs) and exact-vs-suffix blocklist semantics ('bad.org' blocks
    x.bad.org but never xbad.org)."""
    from knowledge_graph_rag_spark.functions.text import (
        domain_blocked_col,
        url_domains_col,
    )

    rows = [
        (1, "see https://A.Example.COM/path and http://cdn.example.com/x"),
        (2, "plain text with no links at all"),
        (3, "scheme-less www.example.com is not extracted"),
        (4, "ftp://not.this.one but https://ok.bad.org/y"),
        (5, "edge https://xbad.org/z stays unblocked (no dot boundary)"),
        (6, "exact https://bad.org/q is blocked"),
    ]
    df = spark.createDataFrame(rows, "i int, text string")
    out = {
        r.i: (list(r.doms), r.blocked)
        for r in df.select(
            "i",
            url_domains_col(F.col("text")).alias("doms"),
            domain_blocked_col(
                url_domains_col(F.col("text")), ["bad.org"]
            ).alias("blocked"),
        ).collect()
    }
    assert out[1] == (["a.example.com", "cdn.example.com"], False)
    assert out[2] == ([], False)
    assert out[3] == ([], False)
    assert out[4] == (["ok.bad.org"], True)
    assert out[5] == (["xbad.org"], False)
    assert out[6] == (["bad.org"], True)
