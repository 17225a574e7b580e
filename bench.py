"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "kg": {"docs": N, "docs_per_sec": N, "triples": N}}

The KG-extraction throughput (docs/sec) is the north-rule headline — the
reference's full pipeline does ≈167 rows/s (BASELINE.md); scaling-efficiency
evidence across two parallelism levels lives in BENCH/run_scaling.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knowledge_graph_rag_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline subset of the driver query pack (one per operator family)
HEADLINE = [
    "top_talkers",
    "exploit_preparation",
    "top3_types_per_user",
    "degree_spikes",
    "pricing_summary",
    "revenue_by_nation",
    "keywords_topk",
    "language_detect",
    "exact_dedup_by_source",
    "ngram_jaccard_pairs",
    "knn_bruteforce",
    # r05 second pass: the two new scan-shaped operator families join the
    # headline (decontam: shingle+broadcast overlap; pii: pure regexp scan),
    # plus one iterationless graph analytic (wedge-enumeration family).
    # Totals grow with coverage — compare per-query values across rounds.
    "benchmark_decontamination",
    "pii_redaction_stats",
    "clustering_coefficients",
]


def main() -> None:
    from knowledge_graph_rag_spark import synth
    from knowledge_graph_rag_spark.operators import extract as X
    from knowledge_graph_rag_spark.plans import driver_queries as DQ

    spark = get_spark(
        app_name="kgrs-bench",
        cores=CPUS,
        # fine splits: the sf0.1 text corpora are small but CPU-dense, so
        # byte-sized default splits would underuse the cores
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
            # keep the captured output clean: no \r progress spam
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # Quiet logging: the r02 bench tail carried a DAGScheduler stack trace.
    # Root cause (reproduced): limit-bearing queries early-terminate their
    # job, and a straggler task's accumulator update then hits the already-
    # unregistered SQL-metrics accumulator — DAGScheduler logs the benign
    # race as "Failed to update accumulator ... non-existent accumulator" at
    # ERROR with a full stack. rc stays 0 and results are unaffected; the
    # DAGScheduler logger alone goes to FATAL so any REAL failure elsewhere
    # still surfaces.
    spark.sparkContext.setLogLevel("ERROR")
    try:
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:  # noqa: BLE001 — logging cosmetics must never fail a run
        pass
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    qs = DQ.extended_queries()  # headline names span driver + extended sets
    # warm the storage layer once per table so timings measure query
    # execution, not first-touch page-cache fill
    for t in ("events", "documents", "embeddings", "lineitem", "orders",
              "customer", "nation"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-3 with recorded spread: the r04 round-over-round delta
        # (8.5 → 10.2 s on byte-identical query code) was unadjudicable from
        # best-of-2 on this shared host (±40% single-shot co-tenant noise) —
        # the spread field is what lets a reader tell noise from regression
        runs = []
        for _ in range(3):
            t0 = time.time()
            # force full execution without driver-side collect costs
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        spreads[name] = round(max(runs) - min(runs), 3)

    # KG pipeline throughput: interleaved corpus sized 4× the documents table,
    # materialized to parquet first (the engine's job is read → extract →
    # resolve; fixture generation is not engine work)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count() * 4
    corpus = f"/tmp/kgrs_bench_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus + "/_SUCCESS"):
        synth.documents_df(spark, n_docs).write.mode("overwrite").parquet(corpus)
    # 96KB splits → ~2 splits per core on the 20k-doc text corpus; at 512KB
    # the CPU-dense extraction stage is capped at ~26 tasks. Scoped to this
    # phase only (runtime-mutable conf) — the relational scans above want
    # the coarser default.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(96 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(8 * 1024))
    docs = spark.read.parquet(corpus)
    X.extract_triples(spark, docs.limit(2048)).count()  # warm Python workers
    # best-of-3 with recorded spread (see the HEADLINE loop comment)
    kg_runs, n_triples = [], 0
    for _ in range(3):
        t0 = time.time()
        n_triples = X.extract_triples(spark, docs).count()
        kg_runs.append(time.time() - t0)
    kg_sec = min(kg_runs)
    timings["kg_extract_triples"] = round(kg_sec, 3)
    spreads["kg_extract_triples"] = round(max(kg_runs) - min(kg_runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_kg_extraction",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "kg": {
                    "docs": n_docs,
                    "docs_per_sec": round(n_docs / kg_sec, 1),
                    "triples": n_triples,
                    "cores": CPUS,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
