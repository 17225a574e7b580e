"""Child job for BENCH/run_graph_scaling.py: per-node clustering
coefficients (the wedge-enumeration graph-analytics family) over a
deterministic synthetic random graph at a fixed parallelism level.

Launched cold per level (spark-submit --py-files kgrs.zip, taskset-pinned)
exactly like BENCH/scale_child.py. The edge list is a pure function of the
row index (xxhash64, seed-stable across sessions/levels), so both levels
compute the IDENTICAL graph and the result checksum must match exactly.
The measured section excludes session startup and edge synthesis — it
times the graph ENGINE (canonicalize → degrees → orient → wedges → close →
attribute), the shuffle-and-join-heavy shape that decides whether the
graph analytics survive a cluster scale-up.

argv: <cores> <n_edges> [job]; job ∈ clustering (default) | shuffle |
join — the latter two are HOST-CEILING probes (one hash aggregation /
one shuffled self-join over the same edge frame), run at the same pinned
levels so the clustering efficiency can be read against what local-mode
shuffle itself scales to on this machine. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores, n_edges = int(sys.argv[1]), int(sys.argv[2])
    job = sys.argv[3] if len(sys.argv) > 3 else "clustering"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"graph-scale-{cores}")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(cores * 4, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from knowledge_graph_rag_spark.operators.graphalgs import local_clustering

    n_nodes = n_edges // 8  # avg degree ~16 — real wedge work per node
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_nodes)).alias(
            "dst"
        ),
    )
    # warm the input once so edge synthesis is outside the measured section
    edges = edges.localCheckpoint(eager=True)

    if job != "clustering":
        t0 = time.time()
        if job == "shuffle":
            edges.groupBy("src").count().agg(F.sum("count")).first()
        else:  # join
            edges.alias("a").join(edges.alias("b"), "src").agg(
                F.count("*")
            ).first()
        sec = time.time() - t0
        print(json.dumps({
            "cores": cores, "n_edges": n_edges, "job": job,
            "sec": round(sec, 3),
            "edges_per_sec": round(n_edges / sec, 1),
        }))
        spark.stop()
        return

    t0 = time.time()
    row = (
        local_clustering(edges)
        .agg(
            F.count("*").alias("nodes"),
            F.sum("degree").alias("deg_sum"),
            F.sum("triangles").alias("tri_sum"),
            F.round(F.sum("coeff"), 4).alias("coeff_sum"),
        )
        .first()
    )
    sec = time.time() - t0
    print(json.dumps({
        "cores": cores,
        "n_edges": n_edges,
        "sec": round(sec, 3),
        "edges_per_sec": round(n_edges / sec, 1),
        "nodes": row["nodes"],
        "deg_sum": row["deg_sum"],
        "tri_sum": row["tri_sum"],
        "coeff_sum": float(row["coeff_sum"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
