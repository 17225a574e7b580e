"""Graph materialization: connections/text → nodes+edges DataFrames, and the
cross-source MERGE (SURVEY.md §2.1 S10-S11, §2.4 J1-J5, §2.8 U3-U4).

Replaces the reference's dict-accumulator graph builders
(``auto_processor.py:657-825``, ``network_parser.py:181-267``) and the
in-memory GraphMerger (``graph_merger.py:35-240``) with shuffle-light
DataFrame plans:

- node dedup = groupBy natural key (A4) — not a driver-side seen-set
- per-IP rollups (J4 attack lookup, J5 anomaly rollup) = two aggregations
  left-joined onto the distinct-IP frame
- merge = union + per-link-key min_by precedence (S11 keep-existing-label
  semantics) + edge endpoint remap via id-map join (J2) + edge dedup (U3)

Output frames conform to NODES_SCHEMA / EDGES_SCHEMA with graph_id first —
the partition column of the materialized tables (partition pruning replaces
the reference's ``MATCH (g)-[:CONTAINS]->`` prefix, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.net import (
    attack_node_id,
    entity_node_id,
    ip_node_id,
    is_internal_ip,
    is_suspicious_port,
    normalize_key,
    port_node_id,
    service_name,
)
from ..schemas import EDGES_SCHEMA, NODES_SCHEMA
from ..vocab import HIGH_SEVERITY_TYPES, SECURITY_ENTITY_TYPES
from .extract import edge_class_col

_NODE_COLS = [f.name for f in NODES_SCHEMA.fields]
_EDGE_COLS = [f.name for f in EDGES_SCHEMA.fields]
_SCHEMA_TYPES = {
    f.name: f.dataType
    for schema in (NODES_SCHEMA, EDGES_SCHEMA)
    for f in schema.fields
}


def _conform(df: DataFrame, cols: list[str]) -> DataFrame:
    """Project to the canonical column set; missing columns become TYPED
    nulls (an untyped NullType column poisons parquet schema merging across
    independently-written graph_id partitions: VOID vs BOOLEAN)."""
    existing = set(df.columns)
    return df.select(
        *[
            F.col(c) if c in existing
            else F.lit(None).cast(_SCHEMA_TYPES[c]).alias(c)
            for c in cols
        ]
    )


# --- telemetry graph (auto_processor._connections_to_enhanced_graph) ---------


def telemetry_nodes(scored_conns: DataFrame, graph_id: str) -> DataFrame:
    """IP + Port + AttackType nodes with attack/anomaly rollups folded in.

    J4: per-source attack sets; J5: per-source anomaly rollup. Both are
    aggregations over the same frame, left-joined onto the distinct-IP set —
    the dest-only IPs get the reference's defaults (auto_processor.py:713-718).
    """
    # J4 — ip → collect_set(attack_type)
    ip_attacks = (
        scored_conns.filter(F.col("attack_type").isNotNull())
        .groupBy(F.col("source_ip").alias("ip"))
        .agg(F.sort_array(F.collect_set("attack_type")).alias("attack_types"))
    )
    # J5 — per-source anomaly rollup (max score among anomalous conns,
    # union of anomaly types, connection count)
    ip_anom = scored_conns.groupBy(F.col("source_ip").alias("ip")).agg(
        F.max(F.col("is_anomaly").cast("int")).cast("boolean").alias("is_anomaly"),
        F.coalesce(
            F.max(F.when(F.col("is_anomaly"), F.col("anomaly_score"))), F.lit(0.0)
        ).alias("anomaly_score"),
        F.sort_array(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.when(F.col("is_anomaly"), F.col("anomaly_types")))
                )
            )
        ).alias("anomaly_types"),
        F.count("*").alias("connection_count"),
    )

    ips = (
        scored_conns.select(F.col("source_ip").alias("ip"))
        .unionByName(scored_conns.select(F.col("dest_ip").alias("ip")))
        .distinct()
    )
    ip_nodes = (
        ips.join(ip_attacks, "ip", "left")
        .join(ip_anom, "ip", "left")
        .select(
            F.lit(graph_id).alias("graph_id"),
            ip_node_id(F.col("ip")).alias("node_id"),
            F.col("ip").alias("label"),
            F.when(is_internal_ip(F.col("ip")), F.lit("InternalIP"))
            .otherwise(F.lit("ExternalIP"))
            .alias("type"),
            F.lit("telemetry").alias("entity_class"),
            is_internal_ip(F.col("ip")).alias("is_internal"),
            (F.coalesce(F.size("attack_types"), F.lit(0)) > 0).alias("is_attacker"),
            F.coalesce(F.col("is_anomaly"), F.lit(False)).alias("is_anomaly"),
            F.coalesce(F.col("anomaly_score"), F.lit(0.0)).alias("anomaly_score"),
            F.coalesce(F.col("anomaly_types"), F.array().cast("array<string>")).alias(
                "anomaly_types"
            ),
            F.coalesce(F.col("attack_types"), F.array().cast("array<string>")).alias(
                "attack_types"
            ),
            F.coalesce(F.col("connection_count"), F.lit(0)).alias("connection_count"),
        )
    )

    port_nodes = (
        scored_conns.select(F.col("dest_port").alias("port")).distinct().select(
            F.lit(graph_id).alias("graph_id"),
            port_node_id(F.col("port")).alias("node_id"),
            F.concat(
                service_name(F.col("port")),
                F.lit(" ("),
                F.col("port").cast("string"),
                F.lit(")"),
            ).alias("label"),
            F.lit("Port").alias("type"),
            F.lit("telemetry").alias("entity_class"),
            F.create_map(
                F.lit("port_number"), F.col("port").cast("string"),
                F.lit("service"), service_name(F.col("port")),
                F.lit("is_suspicious"), is_suspicious_port(F.col("port")).cast("string"),
            ).alias("props"),
        )
    )

    attack_nodes = (
        scored_conns.filter(F.col("attack_type").isNotNull())
        .select(F.col("attack_type").alias("label"))
        .distinct()
        .select(
            F.lit(graph_id).alias("graph_id"),
            attack_node_id(F.col("label")).alias("node_id"),
            "label",
            F.lit("AttackType").alias("type"),
            F.lit("telemetry").alias("entity_class"),
        )
    )

    return (
        _conform(ip_nodes, _NODE_COLS)
        .unionByName(_conform(port_nodes, _NODE_COLS))
        .unionByName(_conform(attack_nodes, _NODE_COLS))
        .withColumn("source", F.lit("network_telemetry"))
    ).select(*_NODE_COLS)


def telemetry_edges(scored_conns: DataFrame, graph_id: str) -> DataFrame:
    """CONNECTED_TO (per connection, with protocol/port/bytes/is_anomaly),
    USES_PORT (dest→port), INVOLVED_IN (src→attack) —
    auto_processor.py:777-823."""
    conn_edges = scored_conns.select(
        F.lit(graph_id).alias("graph_id"),
        F.concat(F.lit("conn_"), F.substring("conn_id", 1, 8)).alias("edge_id"),
        ip_node_id(F.col("source_ip")).alias("src"),
        ip_node_id(F.col("dest_ip")).alias("dst"),
        F.lit("CONNECTED_TO").alias("rel_type"),
        "protocol",
        F.col("dest_port").alias("port"),
        (F.col("bytes_sent") + F.col("bytes_received")).alias("bytes"),
        "is_anomaly",
        F.col("timestamp").alias("ts"),  # edge property (network_parser.py:249)
    )
    port_edges = scored_conns.select(
        F.lit(graph_id).alias("graph_id"),
        F.concat(F.lit("uses_"), F.substring("conn_id", 1, 8)).alias("edge_id"),
        ip_node_id(F.col("dest_ip")).alias("src"),
        port_node_id(F.col("dest_port")).alias("dst"),
        F.lit("USES_PORT").alias("rel_type"),
    )
    attack_edges = (
        scored_conns.filter(F.col("attack_type").isNotNull())
        .select("source_ip", "attack_type")
        .distinct()
        .select(
            F.lit(graph_id).alias("graph_id"),
            F.concat(
                F.lit("attack_edge_"),
                F.substring(F.sha2(F.concat_ws("|", "source_ip", "attack_type"), 256), 1, 12),
            ).alias("edge_id"),
            ip_node_id(F.col("source_ip")).alias("src"),
            attack_node_id(F.col("attack_type")).alias("dst"),
            F.lit("INVOLVED_IN").alias("rel_type"),
        )
    )
    return (
        _conform(conn_edges, _EDGE_COLS)
        .unionByName(_conform(port_edges, _EDGE_COLS))
        .unionByName(_conform(attack_edges, _EDGE_COLS))
    ).select(*_EDGE_COLS)


# --- semantic graph (text extraction output → nodes/edges) -------------------


def semantic_nodes(mentions: DataFrame, graph_id: str) -> DataFrame:
    """Distinct extracted entities → nodes with T3 security defaults
    (graph_extractor.py:436-450): confidence 0.7 / source text_inference for
    security types, severity high for Attack/Exfiltration/CommandAndControl."""
    is_sec = F.col("type").isin(*SECURITY_ENTITY_TYPES)
    nodes = (
        mentions.select("label", "type", "entity_class")
        .dropDuplicates(["label", "type"])
        .select(
            F.lit(graph_id).alias("graph_id"),
            entity_node_id(F.col("label"), F.col("type")).alias("node_id"),
            "label",
            "type",
            "entity_class",
            F.when(is_sec, F.lit(0.7)).alias("confidence"),
            F.when(is_sec, F.lit("text_inference")).alias("source"),
            F.when(
                F.col("type").isin(*HIGH_SEVERITY_TYPES), F.lit("high")
            ).alias("severity"),
        )
    )
    return _conform(nodes, _NODE_COLS)


def semantic_edges(triples: DataFrame, graph_id: str) -> DataFrame:
    """Triples → edges keyed by endpoint natural ids; dangling edges are
    impossible by construction (both endpoints resolved through the alias
    dictionary — the J1 semi-join is implicit in the inner alias joins)."""
    edges = triples.select(
        F.lit(graph_id).alias("graph_id"),
        F.concat(
            F.lit("e_"),
            F.substring(
                F.sha2(F.concat_ws("|", "doc_id", "subj", "pred", "obj"), 256), 1, 12
            ),
        ).alias("edge_id"),
        entity_node_id(F.col("subj"), F.col("subj_type")).alias("src"),
        entity_node_id(F.col("obj"), F.col("obj_type")).alias("dst"),
        F.col("pred").alias("rel_type"),
        edge_class_col(F.col("pred")).alias("edge_class"),
    )
    return _conform(edges, _EDGE_COLS)


# --- MERGE (S11 + graph_merger semantics) ------------------------------------


def merge_graphs(
    semantic_nodes_df: DataFrame,
    semantic_edges_df: DataFrame,
    telemetry_nodes_df: DataFrame,
    telemetry_edges_df: DataFrame,
    merged_graph_id: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Merge a semantic and a telemetry graph (graph_merger.py:35-202).

    Semantics pinned by tests: entities dedup on normalize_key with semantic
    precedence for identity fields (id/label/type — 'keep existing non-empty
    label', neo4j_service.py:132-141); telemetry contributes anomaly_score /
    is_anomaly / anomaly_types / connection_count; ``sources`` records which
    sides contributed; edges remapped to canonical ids and deduped on
    (src, dst, rel_type) with semantic-first priority.

    Returns (merged_nodes, merged_edges, stats_df) — stats_df is the A20
    metrics row set.
    """
    sem = semantic_nodes_df.withColumn("side", F.lit("semantic")).withColumn(
        "side_priority", F.lit(1)
    )
    tel = telemetry_nodes_df.withColumn("side", F.lit("telemetry")).withColumn(
        "side_priority", F.lit(2)
    )
    unioned = sem.unionByName(tel).withColumn(
        "link_key", normalize_key(F.col("label"), F.col("type"))
    ).cache()  # shared by merged_nodes, idmap, and the A20 side counts

    ident = F.struct(
        "node_id", "label", "type", "entity_class", "is_internal", "is_attacker",
        "confidence", "severity", "source",
    )
    order = F.struct("side_priority", "node_id")
    tele_only = lambda c: F.max(F.when(F.col("side") == "telemetry", F.col(c)))  # noqa: E731

    merged_nodes = (
        unioned.groupBy("link_key")
        .agg(
            F.min_by(ident, order).alias("i"),
            tele_only("is_anomaly").alias("t_is_anomaly"),
            tele_only("anomaly_score").alias("t_anomaly_score"),
            tele_only("connection_count").alias("t_connection_count"),
            F.sort_array(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(
                            F.when(F.col("side") == "telemetry", F.col("anomaly_types"))
                        )
                    )
                )
            ).alias("t_anomaly_types"),
            F.sort_array(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(
                            F.when(F.col("side") == "telemetry", F.col("attack_types"))
                        )
                    )
                )
            ).alias("t_attack_types"),
            F.sort_array(F.collect_set("side")).alias("sources"),
            F.sort_array(F.collect_set("graph_id")).alias("graph_origins"),
        )
        .select(
            F.lit(merged_graph_id).alias("graph_id"),
            F.col("i.node_id").alias("node_id"),
            F.col("i.label").alias("label"),
            F.col("i.type").alias("type"),
            F.col("i.entity_class").alias("entity_class"),
            F.col("i.is_internal").alias("is_internal"),
            F.col("i.is_attacker").alias("is_attacker"),
            F.col("t_is_anomaly").alias("is_anomaly"),
            F.col("t_anomaly_score").alias("anomaly_score"),
            F.col("i.confidence").alias("confidence"),
            F.col("i.severity").alias("severity"),
            F.col("i.source").alias("source"),
            F.col("t_connection_count").alias("connection_count"),
            F.col("t_anomaly_types").alias("anomaly_types"),
            F.col("t_attack_types").alias("attack_types"),
            "sources",
            "graph_origins",
        )
    )
    merged_nodes = _conform(merged_nodes, _NODE_COLS)

    # J2: endpoint remap old node_id → canonical node_id of its link_key group
    idmap = unioned.select(
        "node_id", "link_key", "side_priority"
    ).join(
        unioned.groupBy("link_key").agg(
            F.min_by(F.col("node_id"), F.struct("side_priority", "node_id")).alias(
                "canonical_id"
            )
        ),
        "link_key",
    ).select(F.col("node_id").alias("old_id"), "canonical_id").dropDuplicates(["old_id"])

    edges_all = (
        semantic_edges_df.withColumn("side_priority", F.lit(1))
        .unionByName(telemetry_edges_df.withColumn("side_priority", F.lit(2)))
    )
    remapped = (
        edges_all.join(
            idmap.withColumnRenamed("old_id", "src").withColumnRenamed(
                "canonical_id", "new_src"
            ),
            "src",
            "inner",
        )
        .join(
            idmap.withColumnRenamed("old_id", "dst").withColumnRenamed(
                "canonical_id", "new_dst"
            ),
            "dst",
            "inner",
        )
        .withColumn("src", F.col("new_src"))
        .withColumn("dst", F.col("new_dst"))
        .drop("new_src", "new_dst")
    )
    # U3: first-wins dedup by (src, dst, rel_type), semantic first
    from pyspark.sql import Window as W

    w = W.partitionBy("src", "dst", "rel_type").orderBy("side_priority", "edge_id")
    merged_edges = (
        remapped.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("graph_id", F.lit(merged_graph_id))
        .drop("rn", "side_priority")
    )
    merged_edges = _conform(merged_edges, _EDGE_COLS)

    # A20 merge statistics → metrics rows. Three actions over CACHED frames
    # (was five uncached full-plan recomputes — at 100× that re-ran the
    # heaviest shuffle in the job up to 3×): side counts fold into one agg
    # over the cached union; merged count + correlation count fold into one
    # agg over cached merged_nodes.
    merged_nodes = merged_nodes.cache()
    merged_edges = merged_edges.cache()
    sides = unioned.agg(
        F.sum(F.when(F.col("side") == "semantic", 1).otherwise(0)).alias("s"),
        F.sum(F.when(F.col("side") == "telemetry", 1).otherwise(0)).alias("t"),
    ).first()
    sem_n, tel_n = int(sides["s"] or 0), int(sides["t"] or 0)
    nrow = merged_nodes.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.size("sources") > 1, 1).otherwise(0)).alias("corr"),
    ).first()
    merged_n, correlations = int(nrow["n"]), int(nrow["corr"] or 0)
    merged_e = merged_edges.count()
    unioned.unpersist()
    spark = semantic_nodes_df.sparkSession
    stats = spark.createDataFrame(
        [
            ("semantic_nodes", sem_n),
            ("telemetry_nodes", tel_n),
            ("merged_nodes", merged_n),
            ("merged_edges", merged_e),
            ("deduplicated", sem_n + tel_n - merged_n),
            ("new_correlations", correlations),
        ],
        schema="stat string, value long",
    )
    return merged_nodes, merged_edges, stats


def find_correlations(merged_nodes: DataFrame) -> DataFrame:
    """Entities present in >1 source graph, anomaly-score desc
    (graph_merger.py:242-276, J9)."""
    return (
        merged_nodes.filter(F.size("sources") > 1)
        .select(
            F.col("label").alias("entity"),
            F.col("type").alias("entity_type"),
            "sources",
            "graph_origins",
            F.col("confidence").alias("semantic_confidence"),
            F.col("anomaly_score").alias("telemetry_score"),
        )
        .orderBy(F.desc(F.coalesce(F.col("telemetry_score"), F.lit(0.0))), "entity")
    )
