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

For web-scale graphs with long chains use
:func:`connected_components_alternating` (large-star/small-star, O(log² n)
rounds on any shape); both produce identical partitions — cross-checked in
tests/test_merge_link_cc.py::test_cc_implementations_agree.
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


def connected_components_alternating(
    edges: DataFrame, max_iterations: int = 30
) -> DataFrame:
    """Large-star / small-star alternating connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14).

    The web-scale alternative to min-label propagation: converges in
    O(log² n) rounds on ANY graph shape (label propagation needs O(diameter)
    rounds, which bites on long chains). Same output contract:
    (node, component=min id). Both implementations are cross-checked in
    tests/test_merge_link_cc.py::test_cc_implementations_agree.

    large-star: every node points its larger neighbors at the minimum of its
    inclusive neighborhood; small-star: every node points its smaller-or-equal
    neighbors (and itself) at their minimum. Each round is two shuffles and a
    localCheckpoint to keep the plan bounded.
    """
    # canonical undirected representation: (u=max, v=min) pairs
    def _canon(df: DataFrame) -> DataFrame:
        return (
            df.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    cur = _canon(edges).localCheckpoint(eager=True)
    if cur.isEmpty():
        return cur.select(F.col("u").alias("node"), F.col("v").alias("component"))

    def _fingerprint(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row.n, int(row.h))

    prev_fp = _fingerprint(cur)
    for _ in range(max_iterations):
        # large-star over the UNDIRECTED neighborhood: every strictly-larger
        # neighbor of u points at min(Γ⁺(u))
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        nbr_min = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = _canon(
            sym.join(nbr_min, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star over the (max→min) orientation: u's smaller-or-equal
        # neighbors (and u) point at their minimum
        small_min = large.groupBy("u").agg(F.min("v").alias("m"))
        small = _canon(
            large.join(small_min, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(small_min.select("u", F.col("m").alias("v")))
        ).localCheckpoint(eager=True)
        fp = _fingerprint(small)
        cur = small
        if fp == prev_fp:
            break
        prev_fp = fp

    assign = cur.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("node"), "component"
    )
    roots = (
        assign.select(F.col("component").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return assign.unionByName(roots).dropDuplicates(["node"])


def canonical_map_from_links(link_pairs: DataFrame) -> DataFrame:
    """(surface, canonical_surface) from similarity/alias pairs
    (surface_a, surface_b): connected components, representative = min."""
    cc = connected_components(
        link_pairs.select(F.col("surface_a").alias("u"), F.col("surface_b").alias("v"))
    )
    return cc.select(
        F.col("node").alias("surface"), F.col("component").alias("canonical_surface")
    )
