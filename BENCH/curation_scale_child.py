"""Child job for BENCH/run_curation_scaling.py: the curation pipeline's two
heavy engine stages (exact dedup -> MinHash-LSH near-dup drop) over a
deterministic synthetic corpus at a fixed parallelism level.

Launched cold per level (spark-submit --py-files kgrs.zip, taskset-pinned)
exactly like BENCH/scale_child.py. The measured section excludes session
startup and corpus synthesis (fixture generation is not engine work) and
excludes any warehouse writes — it times the dedup ENGINE, mirroring what
dominates jobs/data_submit.py wall time (the LSH stage).

argv: <cores> <n_docs>; prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"curation-scale-{cores}")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(cores * 4, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from knowledge_graph_rag_spark.operators import dedup as DD
    from knowledge_graph_rag_spark.plans.datapipe import _near_dup_drop_ids

    # corpus: n_docs deterministic 30-word documents built from pure column
    # expressions over spark.range — text is a function of the row index
    # alone, so generation is linear, coordination-free, and identical at
    # every parallelism level. Planted duplicate populations at CONSTANT
    # rate and BOUNDED cluster size (pairs): index ≡ 3 (mod 17) is an exact
    # copy of its predecessor, index ≡ 7 (mod 10) is a near-dup (same words
    # + one extra → Jaccard ≈ 0.93). Constant-rate pairs keep the LSH/CC
    # pair count LINEAR in n_docs — replica-based corpora fail both ways
    # (exact copies collapse at the dedup stage and measure only fixed
    # overheads; k near-dup copies form clusters with k² pairs, measuring
    # the corpus instead of the engine).
    idx = F.col("id")
    # exact dup: same BASE text as predecessor (id-1 may itself be a near-
    # dup twin; shift the index before deriving the near-dup base)
    exact_shift = F.when((idx % 17 == 3) & (idx % 10 != 7), idx - 1).otherwise(idx)
    corpus_path = f"/tmp/kgrs_curation_corpus_{n_docs}.parquet"
    import os

    if not os.path.exists(corpus_path + "/_SUCCESS"):
        rng = spark.range(n_docs)
        # recompute words/text against the exact-dup-shifted index
        b2 = F.when(exact_shift % 10 == 7, exact_shift - 1).otherwise(exact_shift)
        # generation tag keeps the corpus aperiodic: without it, docs
        # 5000 apart get identical word sequences (mod-5000 wheel) and the
        # whole corpus collapses at the exact-dedup stage
        w2 = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.concat(
                F.lit("w"), ((b2 * 31 + j * 7) % 5000).cast("string"),
                F.lit("x"), (j % 11).cast("string"),
                F.lit("g"), F.floor(b2 / 5000).cast("string"),
            ),
        )
        t2 = F.concat_ws(" ", w2)
        t2 = F.when(exact_shift % 10 == 7,
                    F.concat(t2, F.lit(" neardupmark"))).otherwise(t2)
        rng.select(
            F.concat(F.lit("d"), idx.cast("string")).alias("doc_id"),
            t2.alias("text"),
        ).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).select("doc_id", "text")

    def job() -> int:
        exact = DD.dedup_exact(docs, "doc_id", "text")
        drops = _near_dup_drop_ids(exact, 0.2, "minhash")
        return exact.join(drops, "doc_id", "left_anti").count()

    job_small = DD.dedup_exact(docs.limit(512), "doc_id", "text")
    job_small.count()  # warm Python workers / broadcast machinery

    runs, survivors = [], 0
    for _ in range(3):
        t0 = time.time()
        survivors = job()
        runs.append(round(time.time() - t0, 3))
    best = min(runs)
    print(json.dumps({
        "cores": cores,
        "docs": n_docs,
        "sec": best,
        "docs_per_sec": round(n_docs / best, 1),
        "all_runs_sec": runs,
        "survivors": survivors,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
