"""Open mention detection (opt-in; beyond the closed-vocabulary contract).

The correctness contract extracts only closed-vocabulary mentions (SURVEY.md
§2.3 — the P/R target is defined over the gazetteer). Real corpora also carry
out-of-dictionary entities; this operator detects them with a deterministic
heuristic so they can flow into the SAME linking/canonicalization stages
(MinHash-LSH + connected components find their alias clusters, which is
exactly where fuzzy canonicalization earns its keep):

- candidate = maximal run of ≥2 capitalized tokens (or one capitalized token
  of length ≥ 3 followed by a digit-bearing token), not starting a sentence
  unless the run extends beyond token 0
- candidates overlapping a gazetteer mention are dropped (closed vocab wins)
- type = "Concept", entity_class = "semantic" (the reference's default node
  type, graph_extractor.py:432)

NOT part of the default pipeline or the oracle comparison — enable by unioning
``open_mentions`` output with ``resolve_mentions`` before node building.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import _mention_regex, _sentence_regex

_CAP_RUN = re.compile(r"(?:[A-Z][\w-]*)(?:\s+(?:[A-Z][\w-]*|\d[\w-]*))+|[A-Z][a-zA-Z]{2,}\s+\d[\w-]*")


@lru_cache(maxsize=1)
def _stop_starters() -> frozenset[str]:
    # sentence-initial capitalized function words that start false candidates
    return frozenset({"The", "A", "An", "On", "At", "In", "It", "This", "That"})


def _open_mentions_in(text: str) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    if not text:
        return out
    m_re = _mention_regex()
    for sent_idx, sent in enumerate(_sentence_regex().split(text)):
        known = [(m.start(), m.end()) for m in m_re.finditer(sent)]
        for m in _CAP_RUN.finditer(sent):
            if any(m.start() < ke and ks < m.end() for ks, ke in known):
                continue
            surface = m.group(0).rstrip(".")
            first = surface.split()[0]
            if m.start() == 0 and first in _stop_starters():
                rest = surface[len(first):].strip()
                if not rest or not rest[0].isupper():
                    continue
                surface = rest
            out.append((surface, sent_idx))
    return out


def open_mentions(spans: DataFrame) -> DataFrame:
    """(doc_id, label, type='Concept', entity_class='semantic') for
    out-of-gazetteer capitalized-run candidates — mapInPandas, same batching
    discipline as the main extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for surface, _idx in _open_mentions_in(text):
                    rows.append({"doc_id": doc_id, "label": surface})
            yield pd.DataFrame(rows, columns=["doc_id", "label"])

    cands = (
        spans.filter(F.col("kind") == "text")
        .select("doc_id", "text")
        .mapInPandas(run, schema="doc_id string, label string")
    )
    return (
        cands.dropDuplicates(["doc_id", "label"])
        .withColumn("type", F.lit("Concept"))
        .withColumn("entity_class", F.lit("semantic"))
    )
