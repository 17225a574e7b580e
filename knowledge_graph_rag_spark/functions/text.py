"""Text scalar functions (reference ``app/utils/text_processors.py``).

Everything that can be a native Column expression is one (JVM-side, inside
whole-stage codegen); only NFKC normalization and boundary-aware chunking need
pandas UDFs (vectorized via Arrow). SURVEY.md §2.2 P7-P10.
"""

from __future__ import annotations

import html
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Sentence-split regex shared with the extractor and the pandas oracle
# (simplified from text_processors.py:47 — the lookbehind set that matters
# for our grammar: break after . ! ? followed by whitespace).
SENTENCE_SPLIT_REGEX = r"(?<=[.!?])\s+"


def clean_text_col(col: Column) -> Column:
    """Whitespace collapse + control-char strip + trim (text_processors.py:9-34).

    HTML unescape / NFKC live in :func:`clean_text_udf`; this native variant
    covers the regex part of the cleaning chain without leaving the JVM.
    """
    c = F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


@F.pandas_udf(T.StringType())
def clean_text_udf(s: pd.Series) -> pd.Series:
    """Full cleaning incl. HTML unescape + NFKC (text_processors.py:22-26)."""

    def _clean(x: str | None) -> str:
        if not x:
            return ""
        x = html.unescape(x)
        x = unicodedata.normalize("NFKC", x)
        return " ".join(x.split())

    return s.map(_clean)


def sentences_col(col: Column) -> Column:
    """array<string> of sentences (text_processors.py:36-48) — native split."""
    return F.filter(
        F.transform(F.split(col, SENTENCE_SPLIT_REGEX), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


def word_tokens_col(col: Column) -> Column:
    """Lowercased word tokens with punctuation stripped
    (text_processors.py:63-67): array<string>."""
    cleaned = F.lower(F.regexp_replace(col, r"[^\w\s]", " "))
    return F.filter(F.split(cleaned, r"\s+"), lambda w: w != F.lit(""))


def wsplit_tokens_col(col: Column) -> Column:
    """THE ``\\W+`` tokenizer of the dedup / retrieval / LM / oracle family:
    ``filter(split(lower(x), '\\W+'), t <> '')`` — array<string>.

    CROSS-ENGINE CONTRACT: every DuckDB oracle in plans/driver_queries.py
    that shingles, scores BM25/TF-IDF, or builds LM bigrams recomputes this
    exact expression as ``list_filter(regexp_split_to_array(lower(text),
    '\\W+'), x -> x <> '')`` — change this helper ONLY together with every
    one of those oracles, or the driver gate goes red. (Distinct from
    ``word_tokens_col`` above, which is the reference's punctuation-strip
    tokenizer and is pinned by different tests.)"""
    return F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != F.lit(""))


def truncate_col(col: Column, max_length: int = 10000) -> Column:
    """Cap text length before extraction (graph_extractor.py:511-514)."""
    return F.when(
        F.length(col) > max_length,
        F.concat(F.substring(col, 1, max_length), F.lit("...")),
    ).otherwise(col)


def truncate_smart_col(col: Column, max_length: int = 10000,
                       add_ellipsis: bool = True) -> Column:
    """Boundary-aware truncation (text_processors.py:81-111): cut at the last
    sentence end when it falls past 80% of max_length, else hard cut; optional
    ellipsis. The 'last sentence end' is found with one greedy regex
    ((?s)^(.*[.!?])) — no UDF."""
    hard = F.substring(col, 1, max_length)
    to_boundary = F.regexp_extract(hard, r"(?s)^(.*[.!?])", 1)
    boundary_ok = F.length(to_boundary) > F.lit(int(0.8 * max_length))
    cut = F.when(boundary_ok, to_boundary).otherwise(hard)
    if add_ellipsis:
        cut = F.concat(cut, F.lit("..."))
    return F.when(F.length(col) <= max_length, col).otherwise(cut)


# boilerplate patterns (text_processors.py:209-216)
_BOILERPLATE_PATTERNS = (
    r"(?i)terms\s+and\s+conditions.*",
    r"(?i)privacy\s+policy.*",
    r"(?i)all\s+rights\s+reserved.*",
    r"(?i)copyright\s+\d{4}.*",
    r"(?i)confidential.*",
    r"(?i)page\s+\d+\s+of\s+\d+",
)


def remove_boilerplate_col(col: Column) -> Column:
    """Strip common boilerplate (text_processors.py:198-220) — chained
    regexp_replace, constant-folded into one codegen stage."""
    out = col
    for pat in _BOILERPLATE_PATTERNS:
        out = F.regexp_replace(out, pat, "")
    return F.trim(out)


def chunk_text(text: str, chunk_size: int = 4000, overlap: int = 200) -> list[str]:
    """Boundary-aware overlapping chunks — semantics of
    ``graph_extractor.py:583-619`` (sentence break preferred past the half-way
    point, else word break, overlap carried backwards)."""
    if len(text) <= chunk_size:
        return [text]
    chunks: list[str] = []
    start = 0
    while start < len(text):
        end = start + chunk_size
        if end < len(text):
            sentence_break = text.rfind(".", start, end)
            if sentence_break > start + chunk_size // 2:
                end = sentence_break + 1
            else:
                word_break = text.rfind(" ", start, end)
                if word_break > start + chunk_size // 2:
                    end = word_break
        chunks.append(text[start:end])
        start = max(start + 1, end - overlap)
    return chunks


def make_chunk_text_udf(chunk_size: int = 4000, overlap: int = 200):
    """Parameterized vectorized wrapper over :func:`chunk_text`; pair with
    posexplode to preserve chunk order (SURVEY.md §2.2 P9)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def chunk_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: chunk_text(x or "", chunk_size, overlap))

    return chunk_udf


chunk_text_udf = make_chunk_text_udf()


# Language-marker sets (text_processors.py:171-174)
LANGUAGE_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "that", "have", "for", "not", "with"),
    "es": ("el", "la", "que", "de", "en", "y", "es", "por"),
    "fr": ("le", "la", "les", "de", "en", "et", "est", "pour"),
    "de": ("der", "die", "das", "und", "ist", "für", "nicht"),
}


def language_marker_score(tokens: Column, lang: str) -> Column:
    """Marker-hit count for one language over a token array — the single
    shared scoring expression (native ``size(filter(...))``, replacing the
    per-word Python loop of text_processors.py:177-180)."""
    lit_markers = F.array(*[F.lit(m) for m in LANGUAGE_MARKERS[lang]])
    return F.size(F.filter(tokens, lambda w: F.array_contains(lit_markers, w)))


def language_scores_cols(tokens: Column) -> list[Column]:
    """One marker-hit-count column per language, from a token array."""
    return [
        language_marker_score(tokens, lang).alias(f"score_{lang}")
        for lang in LANGUAGE_MARKERS
    ]


# Gopher-rule pretraining-quality heuristics (Rae et al. 2021, §A1.1):
# word-count bounds, mean word length 2-12, symbol-ratio cap. Shared by the
# driver entry (gopher_quality_flags, oracle-pinned) and the curation
# pipeline (plans/datapipe.py). Explicit whitespace class: Java \s matches
# \x0B, RE2's does not — the shared class keeps engines identical.
GOPHER_WS = "[ \t\n\r\f]"


def gopher_quality_cols(text: Column) -> dict[str, Column]:
    """Native Gopher quality columns: n_words (long), mean_word_len (double,
    round 3), symbol_ratio (double, round 3), keep (boolean)."""
    w = F.filter(F.split(text, GOPHER_WS + "+"), lambda x: x != F.lit(""))
    n_words = F.size(w)
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(
            F.aggregate(w, F.lit(0).cast("long"),
                        lambda acc, x: acc + F.length(x)).cast("double")
            / n_words,
            3,
        )
    )
    n_chars = F.length(text)
    n_sym = F.length(F.regexp_replace(text, "[A-Za-z0-9 \t\n\r\f]", ""))
    sym_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.round(n_sym.cast("double") / n_chars, 3)
    )
    n_words_l = n_words.cast("long")
    keep = (
        (n_words_l >= 5) & (n_words_l <= 100000)
        & (mean_wl >= 2) & (mean_wl <= 12)
        & (sym_ratio <= 0.1)
    )
    return {
        "n_words": n_words_l,
        "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio,
        "keep": keep,
    }


#: GPT-2-style pre-tokenizer classes (contraction / letter-run / digit-run /
#: punct-run) — the engine's pinned BPE-ish token-count definition. No
#: lookarounds, so the SAME pattern runs in Java regex and DuckDB RE2;
#: oracle-pinned by the bpe_token_counts driver entry. Every token-count
#: consumer (driver entry, curation pipeline) must use THIS constant — a
#: diverging inline copy silently skews training-mix accounting.
BPE_PRETOKEN_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def language_id_col(text: Column) -> Column:
    """Single-expression language ID over whitespace tokens: marker-word hit
    counts with fixed precedence en > es > fr > de, ≥2 hits required, else
    'unknown' — the REFERENCE's decision rule and marker sets
    (text_processors.py:154-196, incl. 'für' in the German set). NOTE the
    language_detect driver entry intentionally runs an ASCII-reduced German
    set (driver_queries._MARKERS) so its DuckDB oracle stays
    encoding-identical across engines — the two classifiers can disagree
    exactly on docs where 'für' is decisive. Used by the curation pipeline
    for language-stratified sampling; scoring shared via
    language_marker_score."""
    toks = F.split(F.lower(text), r"\s+")
    s = {
        lang: language_marker_score(toks, lang)
        for lang in ("en", "es", "fr", "de")
    }
    return (
        F.when(
            (s["en"] >= 2) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"])
            & (s["en"] >= s["de"]), "en",
        )
        .when((s["es"] >= 2) & (s["es"] >= s["fr"]) & (s["es"] >= s["de"]), "es")
        .when((s["fr"] >= 2) & (s["fr"] >= s["de"]), "fr")
        .when(s["de"] >= 2, "de")
        .otherwise("unknown")
    )


#: URL domain extraction — the Java-regex/RE2-identical subset (same
#: cross-engine contract as functions/pii.py): DuckDB oracles recompute it
#: as regexp_extract_all(text, <pattern>, 1).
URL_DOMAIN_REGEX = r"https?://([A-Za-z0-9.-]+)"


def url_domains_col(col: Column) -> Column:
    """array<string> of lowercased URL hostnames found in the text — the
    domain-level signal curation uses for blocklists and per-source stats.
    Screening extraction (scheme + host, no userinfo/port parsing) — the
    standard corpus-filter trade-off, like the PII patterns."""
    return F.transform(
        F.regexp_extract_all(col, F.lit(URL_DOMAIN_REGEX), F.lit(1)),
        F.lower,
    )


def domain_blocked_col(domains: Column, blocklist: list[str]) -> Column:
    """True when ANY extracted domain matches the blocklist exactly or as a
    registrable-suffix ('ads.example.com' matches blocked 'example.com').
    The blocklist is a literal (curation blocklists are small and shipped
    with the job); for web-scale lists join against a broadcast frame
    instead."""
    def hit(d: Column) -> Column:
        c = F.lit(False)
        for b in blocklist:
            c = c | (d == F.lit(b)) | d.endswith(F.lit("." + b))
        return c

    return F.exists(domains, hit)
