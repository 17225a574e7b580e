"""Iterative graph algorithms over (src, dst) edge frames.

Beyond-reference scale-path analytics (the reference's Neo4j holds ≤5k-node
graphs; these are the DataFrame-iterative equivalents that survive 10^9-node
graphs): PageRank here, connected components in operators/canonicalize.

Design notes (the parts that matter at 100×):
- ranks and links shuffle on the same key each iteration; ``localCheckpoint``
  every ``checkpoint_every`` rounds truncates the growing lineage (without
  it, the plan re-derives ALL prior iterations and planning time goes
  quadratic — the classic iterative-DataFrame trap).
- dangling mass (nodes with no out-edges) is redistributed uniformly each
  iteration via one scalar agg, matching the standard formulation.
- out-degrees are computed once and cached; per-iteration work is one join +
  one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node_id, rank) after ``max_iter`` synchronous power iterations with
    uniform teleport and dangling-mass redistribution. Ranks sum to 1."""
    # localCheckpoint, not cache(): a library function must not leave managed
    # memory pinned after the caller drops the result (same hygiene as
    # dedup.simhash_pairs) — checkpoint blocks are reclaimed by the
    # ContextCleaner once the returned frame is unreferenced, while a
    # .cache() here would stay pinned until someone calls unpersist().
    e = edges.select("src", "dst").filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(
        F.count("*").alias("deg")
    ).localCheckpoint(eager=False)
    links = e.join(out_deg, "src")  # (src, dst, deg)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(max_iter):
        contribs = (
            links.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass (rank held by nodes with no out-edges) stays IN the
        # plan as a broadcast 1-row aggregate — a driver-side .first() here
        # would launch an extra job per iteration AND recompute the whole
        # uncheckpointed lineage twice per round
        dangling = F.broadcast(
            ranks.join(
                out_deg.withColumnRenamed("src", "node_id"), "node_id", "left_anti"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node_id"), "node_id", "left")
            .crossJoin(dangling)
            .select(
                "node_id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dmass") / n
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            # eager: materialize the last few rounds once, truncating lineage
            # (ranks feeds both contribs and the dangling agg next round)
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node_id", F.col("rank").cast("double").alias("rank"))
