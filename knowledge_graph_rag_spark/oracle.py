"""Single-threaded pure-Python/pandas oracle for the extraction semantics.

This is the scoring reference for the P/R ≥ 0.95 target (BASELINE.md): a
deliberately *independent* implementation of the deterministic extraction
rules — per-doc loops, per-surface string scans — with no shared code with the
Spark path beyond the vocab/gazetteer data. Mirrors what the reference's LLM
pipeline computes per SURVEY.md §2.3 (T1 mentions/triples, T3 defaults,
T4 canonical predicates, T5 direction flip; chunking P9 is a no-op for spans
under the 4000-char chunk size).
"""

from __future__ import annotations

import re

import pandas as pd

from . import gazetteer as G
from .vocab import DIRECTION_SEMANTICS, SEMANTIC_RELATIONSHIP_MAP, entity_class_of

_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_WORDCHAR = re.compile(r"\w")


def span_sequence(doc: dict) -> list[tuple[str, str, str, int]]:
    """(kind, text, media_ref, order) with order = rank of offset — the
    per-row invariant of BASELINE.json input_hint."""
    ordered = sorted(doc["spans"], key=lambda s: s["offset"])
    return [(s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(ordered)]


def _find_mentions(sent: str) -> list[tuple[int, int, str]]:
    """Leftmost-longest non-overlapping gazetteer matches: scan every surface
    with str.find, then greedy-select by (start asc, length desc)."""
    candidates: list[tuple[int, int, str]] = []
    for surface in G.surface_to_entity():
        start = 0
        while True:
            pos = sent.find(surface, start)
            if pos < 0:
                break
            candidates.append((pos, pos + len(surface), surface))
            start = pos + 1
    candidates.sort(key=lambda c: (c[0], -(c[1] - c[0])))
    chosen: list[tuple[int, int, str]] = []
    cursor = 0
    for s, e, surf in candidates:
        if s >= cursor:
            chosen.append((s, e, surf))
            cursor = e
    return chosen


def _find_relation(inter: str) -> str | None:
    """Earliest word-bounded relation-surface occurrence; ties by length desc.
    Returns the raw predicate."""
    best: tuple[int, int, str] | None = None
    for surface, pred in G.ALL_RELATION_SURFACES:
        pos = 0
        while True:
            i = inter.find(surface, pos)
            if i < 0:
                break
            before_ok = i == 0 or not _WORDCHAR.match(inter[i - 1])
            j = i + len(surface)
            after_ok = j >= len(inter) or not _WORDCHAR.match(inter[j])
            if before_ok and after_ok:
                cand = (i, -len(surface), pred)
                if best is None or cand < best:
                    best = cand
                break
            pos = i + 1
    return best[2] if best else None


def extract_doc(doc: dict) -> tuple[set[tuple[str, str]], set[tuple[str, str, str, str, str]]]:
    """One document → (mention set {(label, type)},
    triple set {(subj, subj_type, pred, obj, obj_type)}) with T4+T5 applied."""
    alias = G.surface_to_entity()
    mentions: set[tuple[str, str]] = set()
    triples: set[tuple[str, str, str, str, str]] = set()
    for _, text, _, _ in span_sequence(doc):
        if not text:
            continue
        for sent in _SENT_RE.split(text):
            found = _find_mentions(sent)
            for _, _, surf in found:
                mentions.add(alias[surf])
            for (s1, e1, surf1), (s2, e2, surf2) in zip(found, found[1:]):
                pred_raw = _find_relation(sent[e1:s2])
                if pred_raw is None:
                    continue
                subj, subj_type = alias[surf1]
                obj, obj_type = alias[surf2]
                # T4 canonical rewrite, then T5 flip (no re-normalize after)
                pred = SEMANTIC_RELATIONSHIP_MAP.get(
                    (subj_type, obj_type, pred_raw), pred_raw
                )
                expected = DIRECTION_SEMANTICS.get(pred)
                if expected and (subj_type, obj_type) == (expected[1], expected[0]):
                    subj, subj_type, obj, obj_type = obj, obj_type, subj, subj_type
                triples.add((subj, subj_type, pred, obj, obj_type))
    return mentions, triples


def triples_pdf(docs: list[dict]) -> pd.DataFrame:
    """TRIPLE_SCHEMA-shaped frame for a doc list (the F4 triples_oracle)."""
    rows = []
    for doc in docs:
        _, triples = extract_doc(doc)
        for subj, subj_type, pred, obj, obj_type in sorted(triples):
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "subj": subj,
                    "subj_type": subj_type,
                    "pred": pred,
                    "obj": obj,
                    "obj_type": obj_type,
                    "confidence": 0.7,
                }
            )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "subj", "subj_type", "pred", "obj", "obj_type", "confidence"],
    )


def mentions_pdf(docs: list[dict]) -> pd.DataFrame:
    rows = []
    for doc in docs:
        mset, _ = extract_doc(doc)
        for label, etype in sorted(mset):
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "label": label,
                    "type": etype,
                    "entity_class": entity_class_of(etype),
                }
            )
    return pd.DataFrame(rows, columns=["doc_id", "label", "type", "entity_class"])


def precision_recall(
    emitted: set[tuple], reference: set[tuple]
) -> tuple[float, float]:
    if not emitted or not reference:
        return (0.0, 0.0)
    tp = len(emitted & reference)
    return tp / len(emitted), tp / len(reference)
