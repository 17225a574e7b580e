"""PII detection + redaction — native regexp Column expressions, no UDF.

Training-data pipelines scrub personally identifiable information before
anything ships to a training mix. This module is the Spark-first version:
per-class match counts via ``F.regexp_count`` and class-tagged redaction via
chained ``F.regexp_replace`` — all JVM-side inside whole-stage codegen, so
the scan stays a single narrow map stage at any corpus size (no shuffle, no
Python). The reference engine has no analogue; this is part of the
beyond-reference LLM-data-pipeline operator set.

Pattern notes:
- Patterns are deliberately restricted to the regex subset with identical
  semantics in Java regex (Spark) and RE2 (DuckDB) — ``\\d``, ``\\b``,
  bounded/unbounded greedy quantifiers, character classes — so the driver
  entry can hash-match a TRUE cross-engine oracle. Both engines use
  leftmost-first matching here.
- Redaction order matters where patterns could nest: EMAIL first (it can
  contain dots/digits), CARD before SSN/PHONE (digit-group prefixes), IPV4
  last among the numeric classes. ``redact_pii_col`` applies ``_REDACT_ORDER``.
- These are screening patterns (high recall on well-formed identifiers),
  not validators — e.g. IPv4 octets are not range-checked; that is the
  standard trade-off for corpus scrubbing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# class -> (pattern, replacement token)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "card": (r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\+\d{1,3}[- ]\d{3}[- ]\d{3}[- ]\d{2,4}", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
}

_REDACT_ORDER = ("email", "card", "ssn", "phone", "ipv4")


def pii_count_cols(col: Column) -> dict[str, Column]:
    """``{class: regexp_count(col, pattern)}`` — one LONG column per class."""
    return {
        name: F.regexp_count(col, F.lit(pat)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact_pii_col(col: Column) -> Column:
    """All PII classes replaced by their ``<CLASS>`` tokens, in nesting-safe
    order (see module docstring)."""
    out = col
    for name in _REDACT_ORDER:
        pat, tok = PII_PATTERNS[name]
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_doc_cols(col: Column) -> dict[str, Column]:
    """Per-document audit columns: per-class counts, total, any-flag, and the
    redacted text. Compose with ``df.withColumns(pii_doc_cols(F.col("text")))``."""
    counts = pii_count_cols(col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    out: dict[str, Column] = {f"pii_{k}": v for k, v in counts.items()}
    out["pii_total"] = total
    out["has_pii"] = total > F.lit(0)
    out["redacted_text"] = redact_pii_col(col)
    return out
