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
    # optional 3rd arg (r06, r05 verdict #7): exact-Jaccard verify threshold
    # for candidate pairs — measures the near_dup_verify_threshold knob's
    # cost at scale. Absent (the harness default) = knob off, unchanged.
    verify = float(sys.argv[3]) if len(sys.argv) > 3 else None
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
    # Index resolution, applied in this order so every planted pair really
    # forms (a near slot's predecessor can be an exact slot and vice versa;
    # near slots are never adjacent to near slots — i-1 of i≡7 is ≡6):
    #   1. near slot (i%10==7): the doc mirrors doc i-1's RESOLVED text
    #   2. exact slot (j%17==3, j not near): the doc copies doc j-1's text
    #   3. doc j-1 may itself be a near-dup twin → carry its mark
    near = idx % 10 == 7
    j = F.when(near, idx - 1).otherwise(idx)
    ej = F.when((j % 17 == 3) & (j % 10 != 7), j - 1).otherwise(j)
    b2 = F.when(ej % 10 == 7, ej - 1).otherwise(ej)
    marked = near | (ej % 10 == 7)
    # v2: cache key carries a generator version — a stale corpus from an
    # older generator would otherwise be reused silently (the _SUCCESS
    # check cannot see code changes)
    corpus_path = f"/tmp/kgrs_curation_corpus_v2_{n_docs}.parquet"
    import os

    if not os.path.exists(corpus_path + "/_SUCCESS"):
        rng = spark.range(n_docs)
        # generation tag keeps the corpus aperiodic: without it, docs
        # 5000 apart get identical word sequences (mod-5000 wheel) and the
        # whole corpus collapses at the exact-dedup stage
        w2 = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j_: F.concat(
                F.lit("w"), ((b2 * 31 + j_ * 7) % 5000).cast("string"),
                F.lit("x"), (j_ % 11).cast("string"),
                F.lit("g"), F.floor(b2 / 5000).cast("string"),
            ),
        )
        t2 = F.concat_ws(" ", w2)
        t2 = F.when(marked, F.concat(t2, F.lit(" neardupmark"))).otherwise(t2)
        rng.select(
            F.concat(F.lit("d"), idx.cast("string")).alias("doc_id"),
            t2.alias("text"),
        ).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).select("doc_id", "text")

    def job() -> int:
        exact = DD.dedup_exact(docs, "doc_id", "text")
        drops = _near_dup_drop_ids(exact, 0.2, "minhash",
                                   verify_threshold=verify)
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
