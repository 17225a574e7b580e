"""spark-submit entry point for the KG-construction pipeline (north rule:
"run via spark-submit --py-files on multi-executor clusters").

Usage (cluster):
    spark-submit --py-files kgrs.zip jobs/kg_submit.py \
        --input /data/documents_interleaved \
        --warehouse /warehouse/kg --graph-id kg_main --run-id run42

Usage (sandbox smoke):
    python jobs/kg_submit.py --synthesize 2000 --warehouse /tmp/kg_wh

On a cluster the session comes from spark-submit (master/executors from the
launcher); get_spark only contributes SQL conf. The job is resumable: re-run
with the same warehouse + graph-id and completed stages are skipped
(GraphStore manifest, SURVEY.md S9).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir with (doc_id, spans) documents")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic interleaved docs instead of --input")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--graph-id", default="kg_main")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--network-logs", help="optional parquet of network logs "
                    "→ telemetry graph + cross-source merge")
    ap.add_argument("--no-lsh", action="store_true",
                    help="skip MinHash-LSH canonicalization stage")
    ap.add_argument("--no-bucketize", action="store_true",
                    help="skip the bucketed query-table copies (default on: "
                    "J1/J2 joins plan exchange-free for downstream readers)")
    args = ap.parse_args()

    from knowledge_graph_rag_spark import synth
    from knowledge_graph_rag_spark.plans import pipeline
    from knowledge_graph_rag_spark.session import get_spark
    from knowledge_graph_rag_spark.sources.graph_store import GraphStore

    spark = get_spark(app_name=f"kg_submit:{args.graph_id}")
    if args.synthesize:
        docs = synth.documents_df(spark, args.synthesize)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthesize is required")

    store = GraphStore(spark, args.warehouse)
    if args.network_logs:
        logs = spark.read.parquet(args.network_logs)
        res = pipeline.run_full(spark, docs, logs, store, run_id=args.run_id,
                                semantic_graph_id=args.graph_id)
    else:
        res = pipeline.run(spark, docs, store, graph_id=args.graph_id,
                           run_id=args.run_id,
                           enable_lsh_canonicalization=not args.no_lsh,
                           bucketed_query_tables=not args.no_bucketize)

    print(json.dumps({
        "run_id": res.run_id,
        "stages_run": res.stages_run,
        "stages_skipped": res.stages_skipped,
        "counts": res.counts,
        "graphs": store.list_graphs(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
