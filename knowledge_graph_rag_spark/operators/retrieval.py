"""Grounded-retrieval engine queries (SURVEY.md §3.2 / rag_service.py).

The reference's staged fallback retrieval (founder fast-path → entity search
→ bounded paths → node info → fulltext → overview, ``rag_service.py:84-332``)
is API-layer control flow; each stage's *engine query* lives here as a
DataFrame plan over the (nodes, edges) frames. Bounds mirror the reference:
path depth ≤ 2, ≤ 3 candidate pairs, LIMIT everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .detectors import two_hop_paths


def entity_search(nodes: DataFrame, text: str, limit: int = 20) -> DataFrame:
    """Case-insensitive contains-search over labels (rag_service.py:92-144,
    J10 existence-probe shape)."""
    needle = text.lower()
    return (
        nodes.filter(F.lower(F.col("label")).contains(needle))
        .select("node_id", "label", "type", "entity_class")
        .orderBy("label")
        .limit(limit)
    )


def node_info(nodes: DataFrame, edges: DataFrame, node_id: str,
              neighbor_limit: int = 25) -> tuple[DataFrame, DataFrame]:
    """One node's row + its 1-hop neighborhood (both directions), labels
    resolved (rag_service.py:231-264)."""
    node = nodes.filter(F.col("node_id") == node_id)
    out_n = edges.filter(F.col("src") == node_id).select(
        F.lit("out").alias("direction"), "rel_type", F.col("dst").alias("neighbor_id")
    )
    in_n = edges.filter(F.col("dst") == node_id).select(
        F.lit("in").alias("direction"), "rel_type", F.col("src").alias("neighbor_id")
    )
    labels = nodes.select(
        F.col("node_id").alias("neighbor_id"), F.col("label").alias("neighbor_label")
    )
    neighbors = (
        out_n.unionByName(in_n)
        .join(labels, "neighbor_id", "left")
        .orderBy("direction", "rel_type", "neighbor_id")
        .limit(neighbor_limit)
    )
    return node, neighbors


def paths_between(nodes: DataFrame, edges: DataFrame, label_a: str, label_b: str,
                  max_pairs: int = 3) -> DataFrame:
    """Bounded 1..2-hop paths between entities matched by label — the
    reference caps candidate pairs at 3 and depth at 2 to avoid blow-up
    (rag_service.py:170-197); same bounds here."""
    a_ids = [r.node_id for r in entity_search(nodes, label_a, max_pairs).collect()]
    b_ids = [r.node_id for r in entity_search(nodes, label_b, max_pairs).collect()]
    out = None
    for a in a_ids:
        for b in b_ids:
            if a == b:
                continue
            p = two_hop_paths(edges, a, b)
            out = p if out is None else out.unionByName(p)
    if out is None:
        spark = nodes.sparkSession
        return spark.createDataFrame(
            [], "hops int, path array<string>, rels array<string>"
        )
    return out.dropDuplicates(["path"]).orderBy("hops").limit(10)


def graph_overview(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Fallback overview: type histogram with examples (rag_service.py:266-332,
    same shape as the `general` template)."""
    return (
        nodes.groupBy("type")
        .agg(
            F.count("*").alias("count"),
            F.slice(F.sort_array(F.collect_set("label")), 1, 5).alias("examples"),
        )
        .orderBy(F.desc("count"), "type")
        .limit(10)
    )
