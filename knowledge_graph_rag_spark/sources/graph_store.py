"""Partitioned graph tables: snapshot writes, MERGE upsert, checkpoint/resume.

Replaces the reference's Neo4j sink (``neo4j_service.py:62-310``) with
Iceberg-style partitioned parquet tables (the sandbox has no Iceberg catalog;
layout and commit protocol mirror it):

- nodes/edges partitioned by ``graph_id`` → every query's `MATCH (g {id})`
  prefix becomes partition pruning (S12/S13, SURVEY.md §4)
- S10 CREATE = snapshot write; S11 MERGE = read-current ∪ incoming →
  per-key precedence merge → new snapshot (idempotent; last-writer-wins on
  props, keep-existing-label on identity — neo4j_service.py:132-141)
- a ``_manifest`` table mirrors the reference's ``.processed_files`` ledger
  (auto_processor.py:843-883): one row per committed (stage, unit); re-runs
  skip committed units → the resume contract of the north rule.

Snapshots are directories ``<root>/<table>/snapshot=<n>``; the active snapshot
is the max n with a ``_COMMITTED`` marker, so a killed write is invisible
(atomic-by-rename is not assumed; readers only trust the marker).

Scale note: this sandbox store rewrites the whole table per snapshot
(copy-on-write at table granularity) because there is no catalog service.
On a real deployment the same call sites map 1:1 onto Iceberg's
``overwritePartitions``/``RewriteFiles`` commits — per-partition manifests
mean a MERGE into one graph_id touches only that partition's files, and the
manifest ledger below becomes Iceberg snapshot metadata. The engine-facing
API (store_graph / store_graph_merge / read / is_done) would not change.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class GraphStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- snapshot plumbing ---------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snapshots(self, table: str) -> list[int]:
        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for name in os.listdir(tdir):
            if name.startswith("snapshot="):
                snap = int(name.split("=", 1)[1])
                if os.path.exists(os.path.join(tdir, name, "_COMMITTED")):
                    out.append(snap)
        return sorted(out)

    def current_snapshot(self, table: str) -> int | None:
        snaps = self._snapshots(table)
        return snaps[-1] if snaps else None

    def _snapshot_path(self, table: str, snap: int) -> str:
        return os.path.join(self._table_dir(table), f"snapshot={snap}")

    def write_snapshot(self, table: str, df: DataFrame,
                       partition_by: tuple[str, ...] = ("graph_id",),
                       sort_within: tuple[str, ...] = ()) -> int:
        """Commit a new snapshot; returns the snapshot id. The _COMMITTED
        marker is written only after the parquet job succeeds, so partial
        writes never become visible (resume-safe).

        ``sort_within`` clusters rows inside each file (the poor man's
        Z-order): sorting nodes by node_id / edges by src tightens parquet
        min-max stats so point lookups and range scans skip row groups."""
        cur = self.current_snapshot(table)
        snap = (cur + 1) if cur is not None else 0
        path = self._snapshot_path(table, snap)
        if sort_within:
            df = df.sortWithinPartitions(*sort_within)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        with open(os.path.join(path, "_COMMITTED"), "w") as f:
            json.dump({"snapshot": snap, "committed_at": time.time()}, f)
        return snap

    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        snap = snapshot if snapshot is not None else self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        return self.spark.read.parquet(self._snapshot_path(table, snap))

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    # --- graph API (S10-S13) ---------------------------------------------------

    def store_graph(self, nodes: DataFrame, edges: DataFrame) -> tuple[int, int]:
        """S10 CREATE semantics: append the graph as a new snapshot containing
        previous content plus the new graph_id partitions (replacing them if
        re-run — idempotent)."""
        new_ids = [r.graph_id for r in nodes.select("graph_id").distinct().collect()]
        sort_cols = {"nodes": ("node_id",), "edges": ("src", "dst")}
        for table, df in (("nodes", nodes), ("edges", edges)):
            if self.exists(table):
                old = self.read(table).filter(~F.col("graph_id").isin(new_ids))
                df = old.unionByName(df, allowMissingColumns=True)
            self.write_snapshot(table, df, sort_within=sort_cols[table])
        return (self.current_snapshot("nodes"), self.current_snapshot("edges"))

    def store_graph_merge(self, nodes: DataFrame, edges: DataFrame,
                          graph_id: str) -> None:
        """S11 MERGE upsert into an existing graph_id partition
        (neo4j_service.py:76-188):

        nodes — `MERGE (n:Node {id})`: on-create take incoming row; on-match
        keep existing non-empty label/type, overwrite props (new side wins
        column-wise where non-null).
        edges — `MERGE (s)-[r]->(t)` keyed (src, dst, rel_type): new props win.
        """
        inc_nodes = nodes.withColumn("graph_id", F.lit(graph_id)).withColumn(
            "_prio", F.lit(2)
        )
        inc_edges = edges.withColumn("graph_id", F.lit(graph_id)).withColumn(
            "_prio", F.lit(2)
        )
        if self.exists("nodes"):
            old = self.read("nodes")
            old_part = old.filter(F.col("graph_id") == graph_id).withColumn(
                "_prio", F.lit(1)
            )
            both = old_part.unionByName(inc_nodes, allowMissingColumns=True)
            # keep-existing-label: identity fields from the OLD row when present;
            # value/props fields last-writer-wins (incoming side)
            ident_cols = [c for c in ("label", "type", "entity_class") if c in both.columns]
            value_cols = [
                c for c in both.columns
                if c not in ("node_id", "_prio", *ident_cols)
            ]
            ident_first = F.struct("_prio", "node_id")
            merged = both.groupBy("node_id").agg(
                F.min_by(F.struct(*ident_cols), ident_first).alias("_i"),
                F.max_by(F.struct(*value_cols), ident_first).alias("_v"),
            ).select(
                "node_id",
                *[F.col(f"_i.{c}").alias(c) for c in ident_cols],
                "_v.*",
            )
            keep = old.filter(F.col("graph_id") != graph_id)
            out_nodes = keep.unionByName(
                merged.select(*old.columns), allowMissingColumns=True
            )
        else:
            out_nodes = inc_nodes.drop("_prio")
        self.write_snapshot("nodes", out_nodes)

        if self.exists("edges"):
            old_e = self.read("edges")
            old_part_e = old_e.filter(F.col("graph_id") == graph_id).withColumn(
                "_prio", F.lit(1)
            )
            both_e = old_part_e.unionByName(inc_edges, allowMissingColumns=True)
            w = Window.partitionBy("src", "dst", "rel_type").orderBy(
                F.desc("_prio"), "edge_id"
            )
            merged_e = (
                both_e.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_prio")
            )
            keep_e = old_e.filter(F.col("graph_id") != graph_id)
            out_edges = keep_e.unionByName(
                merged_e.select(*old_e.columns), allowMissingColumns=True
            )
        else:
            out_edges = inc_edges.drop("_prio")
        self.write_snapshot("edges", out_edges)

    def get_graph(self, graph_id: str, node_limit: int = 1000,
                  edge_limit: int = 2000) -> tuple[DataFrame, DataFrame]:
        """S12 read caps (neo4j_service.py:190): partition-pruned scans."""
        n = self.read("nodes").filter(F.col("graph_id") == graph_id).limit(node_limit)
        e = self.read("edges").filter(F.col("graph_id") == graph_id).limit(edge_limit)
        return n, e

    def list_graphs(self) -> list[str]:
        """S13: distinct graph ids (SHOW PARTITIONS analogue)."""
        if not self.exists("nodes"):
            return []
        return sorted(
            r.graph_id for r in self.read("nodes").select("graph_id").distinct().collect()
        )

    def delete_graph(self, graph_id: str) -> None:
        """S13 DETACH DELETE: drop the partition via a filtered new snapshot."""
        for table in ("nodes", "edges"):
            if self.exists(table):
                self.write_snapshot(
                    table, self.read(table).filter(F.col("graph_id") != graph_id)
                )

    # --- manifest / resume (S9) -----------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _load_manifest(self) -> dict[str, dict]:
        if os.path.exists(self._manifest_path()):
            with open(self._manifest_path()) as f:
                return json.load(f)
        return {}

    def is_done(self, stage: str, unit: str = "") -> bool:
        return f"{stage}::{unit}" in self._load_manifest()

    def mark_done(self, stage: str, unit: str = "", **meta) -> None:
        m = self._load_manifest()
        m[f"{stage}::{unit}"] = {"committed_at": time.time(), **meta}
        with open(self._manifest_path(), "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)

    def completed_stages(self) -> list[str]:
        return sorted(self._load_manifest())
