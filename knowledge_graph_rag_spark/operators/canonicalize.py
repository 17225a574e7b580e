"""Canonicalization: connected components over alias/similarity edges.

The north rule requires MinHash-LSH + connected-components canonicalization;
the reference's analogue is single-pass exact-key dedup (``graph_merger.py:
104-140``). graphframes isn't in the environment, so this implements
**iterative min-label propagation** as a DataFrame loop:

    label(u) ← min(label(u), min_{v ∈ Γ(u)} label(v))

Each iteration is one shuffle (join labels onto the symmetrized edge list +
groupBy) and localCheckpoints to cut lineage so plans stay bounded
(SURVEY.md §7 "what's hard" a). Converges in O(component diameter)
iterations — alias/similarity clusters are star-like and shallow (2-3 rounds).
For web-scale graphs with long chains swap in large-star/small-star; the loop
structure (checkpointed DataFrame iteration with an early-stop count) is the
same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    return (
        edges.select("u", "v")
        .unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """(node, component) with component = min node id of the component.

    ``edges`` needs columns (u, v); string or numeric ids both work (min is
    lexicographic for strings — any total order yields a canonical
    representative).
    """
    sym = _symmetric(edges).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        nbr_label = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_label.withColumnRenamed("u", "node"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("old_label"),
            )
        )
        changed = new_labels.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = new_labels.select("node", "label").localCheckpoint(eager=True)
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def canonical_map_from_links(link_pairs: DataFrame) -> DataFrame:
    """(surface, canonical_surface) from similarity/alias pairs
    (surface_a, surface_b): connected components, representative = min."""
    cc = connected_components(
        link_pairs.select(F.col("surface_a").alias("u"), F.col("surface_b").alias("v"))
    )
    return cc.select(
        F.col("node").alias("surface"), F.col("component").alias("canonical_surface")
    )
