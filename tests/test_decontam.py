"""Benchmark decontamination (operators/decontam.py) vs a pure-python oracle."""

import re

import pytest
from pyspark.sql import functions as F

from knowledge_graph_rag_spark.operators.decontam import decontaminate


def _grams(text: str, n: int) -> set[str]:
    w = [t for t in re.split(r"\W+", text.lower()) if t]
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


@pytest.fixture(scope="module")
def frames(spark):
    bench_rows = [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "one two three four five six seven eight nine"),
    ]
    corpus_rows = [
        # full copy of a benchmark doc — everything contaminated
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        # partial overlap: shares the 'three four five six' span only
        (2, "zero zero three four five six hundred thousand million billion"),
        # clean
        (3, "spark shuffles broadcast joins adaptive execution partitions"),
        # overlap via a single 3-gram at the seam
        (4, "noise words then alpha beta gamma and unrelated tail content"),
        # too short for n=3 after tokenization — must NOT appear in output
        (5, "tiny doc"),
    ]
    return (
        spark.createDataFrame(corpus_rows, "doc_id int, text string"),
        spark.createDataFrame(bench_rows, "doc_id int, text string"),
        corpus_rows,
        bench_rows,
    )


def test_decontaminate_matches_python_oracle(frames):
    corpus, bench, corpus_rows, bench_rows = frames
    n = 3
    bench_grams = set().union(*(_grams(t, n) for _, t in bench_rows))
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=n).collect()}

    expected_ids = {i for i, t in corpus_rows if len(_grams(t, n)) > 0}
    assert set(out) == expected_ids  # doc 5 too short -> absent
    for i, t in corpus_rows:
        g = _grams(t, n)
        if not g:
            continue
        hit = len(g & bench_grams)
        r = out[i]
        assert r["n_grams"] == len(g)
        assert r["n_contaminated"] == hit
        assert abs(r["contamination"] - hit / len(g)) < 1e-12
        assert r["contaminated"] == (hit > 0)
    # spot semantics: full copy fully contaminated, clean doc at zero
    assert out[1]["contamination"] == 1.0
    assert out[3]["n_contaminated"] == 0 and not out[3]["contaminated"]
    assert out[4]["contaminated"]


def test_decontaminate_flag_threshold(frames):
    corpus, bench, corpus_rows, bench_rows = frames
    # with a high threshold only the full copy is flagged
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench, n=3, flag_threshold=0.5).collect()
    }
    assert out[1] is True
    assert out[2] is False and out[4] is False


def test_decontaminate_no_broadcast_parity(frames):
    corpus, bench, *_ = frames
    a = sorted(
        decontaminate(corpus, bench, n=3, broadcast_benchmark=True).collect()
    )
    b = sorted(
        decontaminate(corpus, bench, n=3, broadcast_benchmark=False).collect()
    )
    assert a == b
