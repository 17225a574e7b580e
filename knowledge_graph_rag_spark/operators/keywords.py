"""Corpus-level TF-IDF keyword extraction.

The per-document keyword op the reference exposes (P8) is frequency-only;
at corpus scale the standard upgrade is TF-IDF — a term's weight divides by
its corpus-wide document frequency, so boilerplate vocabulary drops out of
every doc's keyword list without any stopword table.

Shape at 100 TB: term counting is one shuffle on (doc, term) with map-side
combine; document frequency is one more on (term) — unbounded vocabulary,
so the df table is JOINED on term (shuffle join), never broadcast or
collected; the corpus size N is a one-row aggregate (broadcast by AQE).
Per-doc top-k is the usual rank window on the doc key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame, id_col: str = "id", text_col: str = "text",
    top_k: int = 3, min_term_len: int = 3,
) -> DataFrame:
    """(id, term, tf, df, score, rank): each doc's ``top_k`` terms by
    tf·ln(N/df), ties broken by term. Terms shorter than ``min_term_len``
    are dropped (single letters / particles carry no keyword signal).
    Scores are rounded BEFORE ranking so engines tie-break identically."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"),
        lambda t: F.length(t) >= min_term_len,
    )
    terms = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    dfreq = terms.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(F.desc("score"), "term")
    return (
        terms.join(dfreq, "term")
        .crossJoin(n_docs)
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
        .drop("n_docs")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
