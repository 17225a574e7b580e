"""Corpus-trained n-gram LM quality scoring (the CCNet signal, engine-side).

CCNet/CC-100-style pipelines rank documents by language-model perplexity:
low-perplexity text is fluent prose, high-perplexity is gibberish, tables,
or boilerplate soup. The production version scores against a pretrained
KenLM; this operator is the self-contained, fully deterministic variant —
an add-k-smoothed bigram model TRAINED ON THE CORPUS ITSELF, which already
separates fluent from degenerate documents (a doc of rare token transitions
scores high) and, unlike a shipped binary model, is reproducible by a second
engine row-for-row (the driver entry hash-matches a DuckDB recomputation,
ln-arithmetic included).

Scale shape: tokens → per-doc bigram stream (native transform/explode, no
UDF, multiplicity preserved); two corpus-wide count tables (bigram and
prefix counts — the prefix table derives from the aggregated bigram
counts, never a second corpus pass — unbounded vocabulary, joined on the
token keys, NEVER broadcast or collected); vocabulary size and the
smoothing constant ride along as a broadcast 1-row aggregate; one final
per-doc aggregation. The bigram stream is checkpointed, so the corpus is
tokenized exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: float = 0.5, round_digits: int = 4,
) -> DataFrame:
    """``(id_col, n_bigrams, avg_nll)`` — per-document average negative log
    probability under the corpus's add-``k`` bigram model:
    P(w2|w1) = (c(w1 w2) + k) / (c(w1·) + k·V), V = corpus vocabulary.
    Lower = more typical of the corpus. Documents with fewer than two
    tokens have no bigrams and are excluded (they cannot be scored)."""
    from ..functions.text import wsplit_tokens_col

    toks = docs.select(
        F.col(id_col).alias("id"), wsplit_tokens_col(F.col(text_col)).alias("w")
    )
    # vocabulary over ALL tokens (single-token docs included)
    vocab = toks.select(F.explode("w").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    # per-doc bigram stream, duplicates preserved (this is an LM, not a
    # shingle SET); token array materialized before the pair lambda reads
    # it via F.get (the HOF re-evaluation trap — see dedup.word_shingles)
    pairs = F.transform(
        F.slice(F.col("w"), 1, F.size("w") - 1),
        lambda x, i: F.struct(
            x.alias("w1"), F.get(F.col("w"), i + 1).alias("w2")
        ),
    )
    # the tokenize+explode bigram stream feeds the count aggregation AND the
    # final scoring join — checkpoint it so the corpus is tokenized ONCE
    # (house style: dedup.ngram_jaccard_pairs' grouped table)
    bi = (
        toks.filter(F.size("w") >= 2)
        .select("id", F.explode(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # prefix counts derive from the ALREADY-AGGREGATED bigram counts
    # (c(w1·) = Σ_w2 c(w1 w2)) — a tiny table, never a second corpus pass
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    nll = -F.log(
        (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        bi.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), round_digits).alias("avg_nll"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "avg_nll")
    )
