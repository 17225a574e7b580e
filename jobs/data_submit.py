"""spark-submit entry point for the training-data curation pipeline.

Chains the LLM-data-pipeline operators (exact dedup → MinHash near-dup drop
→ Gopher quality gate → deterministic hash sample → token stats) as ONE
resumable, lineage-tracked job — see plans/datapipe.py for the stage/commit
protocol (same GraphStore manifest resume semantics as jobs/kg_submit.py).

Usage (cluster):
    spark-submit --py-files kgrs.zip jobs/data_submit.py \
        --input /data/documents --warehouse /warehouse/curation \
        --dataset-id corpus_v1 --sample-fraction 0.5

Usage (sandbox smoke):
    python jobs/data_submit.py --input /root/testdata/sf0.001/documents.parquet \
        --warehouse /tmp/dp_wh
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet dir/file with (doc_id, text, …) documents")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--dataset-id", default="corpus")
    ap.add_argument("--run-id", default="cur0")
    ap.add_argument("--near-dup-max-dist", type=float, default=0.2)
    ap.add_argument("--near-dup", default="minhash",
                    choices=("minhash", "simhash", "none"),
                    help="near-dup strategy: minhash (LSH, higher recall), "
                    "simhash (cheaper at scale), none (skip the stage)")
    ap.add_argument("--near-dup-verify-threshold", type=float, default=None,
                    help="confirm near-dup candidates by exact word-3-gram "
                    "Jaccard >= this before dropping (unset = drop on "
                    "unverified candidates, the pre-r05 behavior)")
    ap.add_argument("--decontam-benchmark", default=None,
                    help="parquet dir/file with (doc_id, text) benchmark/"
                    "eval docs: adds the decontam stage (drop corpus docs "
                    "with any n-gram overlap)")
    ap.add_argument("--decontam-ngram", type=int, default=None,
                    help="n-gram size for decontamination (default 13; "
                    "requires --decontam-benchmark)")
    ap.add_argument("--pii-scrub", action="store_true",
                    help="redact PII in text (class tokens like <EMAIL>) "
                    "after the quality gate, before sampling/token stats")
    ap.add_argument("--sample-fraction", type=float, default=1.0)
    ap.add_argument("--lang-fractions", default=None,
                    help="language-stratified sampling, e.g. 'en=0.3,de=1.0' "
                    "(languages not listed fall back to --sample-fraction)")
    args = ap.parse_args()
    if args.decontam_ngram is not None and not args.decontam_benchmark:
        ap.error("--decontam-ngram requires --decontam-benchmark "
                 "(without a benchmark no decontam stage runs)")
    lang_fractions = None
    if args.lang_fractions:
        lang_fractions = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.lang_fractions.split(","))
        }

    from knowledge_graph_rag_spark.plans import datapipe
    from knowledge_graph_rag_spark.session import get_spark
    from knowledge_graph_rag_spark.sources.graph_store import GraphStore

    spark = get_spark(app_name=f"data_submit:{args.dataset_id}")
    docs = spark.read.parquet(args.input)
    store = GraphStore(spark, args.warehouse)
    res = datapipe.curate(
        spark, docs, store,
        dataset_id=args.dataset_id, run_id=args.run_id,
        near_dup_max_dist=args.near_dup_max_dist,
        sample_fraction=args.sample_fraction,
        lang_fractions=lang_fractions,
        near_dup_strategy=args.near_dup,
        near_dup_verify_threshold=args.near_dup_verify_threshold,
        benchmark=(
            spark.read.parquet(args.decontam_benchmark)
            if args.decontam_benchmark else None
        ),
        decontam_ngram=(
            args.decontam_ngram if args.decontam_ngram is not None else 13
        ),
        pii_scrub=args.pii_scrub,
    )
    print(json.dumps({
        "run_id": res.run_id,
        "stages_run": res.stages_run,
        "stages_skipped": res.stages_skipped,
        "counts": res.counts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
