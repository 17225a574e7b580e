"""One scaling level, launched via ``spark-submit --py-files kgrs.zip`` (the
north rule's launch path) by BENCH/run_scaling.py. The engine package comes
from the --py-files zip — this script must not sys.path the repo.

argv: cores n_docs
"""

import json
import os
import sys
import time

from knowledge_graph_rag_spark import synth
from knowledge_graph_rag_spark.operators import extract as X
from knowledge_graph_rag_spark.session import get_spark

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(
    app_name=f"kgrs-scale-{cores}", cores=cores,
    shuffle_partitions=max(8, cores),
    # split the compressed text corpus fine enough that every core gets ~10
    # waves of extraction work (wave-tail stragglers cost the
    # high-parallelism level the most)
    extra_conf={
        "spark.sql.files.maxPartitionBytes": str(768 * 1024),
        "spark.sql.files.openCostInBytes": str(64 * 1024),
    },
)
# materialize the corpus OUTSIDE the measured section: the engine's job is
# read → extract → resolve, not test-fixture generation
corpus = f"/tmp/kgrs_scale_corpus_{n_docs}.parquet"
if not os.path.exists(corpus + "/_SUCCESS"):
    synth.documents_df(spark, n_docs).write.mode("overwrite").parquet(corpus)
docs = spark.read.parquet(corpus)
# warm-up: JIT + Python worker pool (enough partitions to spin every worker)
X.extract_triples(spark, docs.limit(cores * 512)).count()
# best-of-3: per-run GC/JIT/shuffle noise is several seconds, which at these
# job lengths swamps the scaling signal; the minimum is the honest capability
times, n_triples = [], 0
for _ in range(3):
    t0 = time.time()
    n_triples = X.extract_triples(spark, docs).count()
    times.append(time.time() - t0)
elapsed = min(times)
print(json.dumps({
    "cores": cores, "docs": n_docs, "sec": round(elapsed, 3),
    "docs_per_sec": round(n_docs / elapsed, 1),
    "all_runs_sec": [round(t, 3) for t in times],
    "triples": n_triples,
}))
spark.stop()
