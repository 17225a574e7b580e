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


# --- RAG context assembly (operators/retrieval.py) --------------------------


def test_chunk_words_df(spark):
    from knowledge_graph_rag_spark.operators.retrieval import chunk_words_df

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),   # 7 words -> 3+3+1
            (2, "a b c"),                                # exactly one chunk
            (3, ""),                                     # empty -> no rows
        ],
        "doc_id int, text string",
    )
    out = sorted(
        (r.id, r.chunk_id, r.chunk_text)
        for r in chunk_words_df(docs, chunk_size=3).collect()
    )
    assert out == [
        (1, 0, "one two three"),
        (1, 1, "four five six"),
        (1, 2, "seven"),
        (2, 0, "a b c"),
    ]


def test_assemble_context_semantics(spark):
    """Top-scoring chunk pulls in its positional neighbors; merged context
    preserves chunk order; documents without hits are absent; best_rank/
    n_chunks bookkeeping is correct."""
    from knowledge_graph_rag_spark.operators.retrieval import assemble_context

    rows = [
        # doc 1: the query terms sit in the MIDDLE chunk (words 4-6 of 9)
        (1, "alpha beta gamma needle needle haystack delta epsilon zeta"),
        # doc 2: one weak mention at the start
        (2, "needle filler words only here nothing else relevant at all"),
        # doc 3: no query terms at all
        (3, "completely unrelated text about other things entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.doc_id: r
        for r in assemble_context(
            docs, "needle haystack", k=3, chunk_size=3, window=1
        ).collect()
    }
    assert 3 not in out
    # doc 1's hit chunk is cid=1 ('needle needle haystack'); window=1 pulls
    # cids 0..2 -> the whole doc in order
    assert out[1].best_rank == 1
    assert out[1].n_chunks == 3
    assert out[1].context == rows[0][1]
    # doc 2's hit is cid=0; neighbors are cids 0..1 only
    assert out[2].n_chunks == 2
    assert out[2].context == "needle filler words only here nothing"
    assert out[2].best_rank > out[1].best_rank


def test_assemble_context_doc_ids_with_colons(spark):
    """Composite doc:chunk keys parse from the RIGHT — a ':' inside a string
    doc id must not cross-wire or drop hits."""
    from knowledge_graph_rag_spark.operators.retrieval import assemble_context

    rows = [
        ("a:1", "alpha beta gamma needle needle haystack delta epsilon zeta"),
        ("a", "totally unrelated filler text with nothing of interest here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r.doc_id: r
        for r in assemble_context(
            docs, "needle haystack", k=2, chunk_size=3, window=1
        ).collect()
    }
    assert set(out) == {"a:1"}
    assert out["a:1"].context == rows[0][1]
