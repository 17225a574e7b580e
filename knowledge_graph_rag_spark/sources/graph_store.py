"""Partitioned graph tables: snapshot writes, MERGE upsert, checkpoint/resume.

Replaces the reference's Neo4j sink (``neo4j_service.py:62-310``) with
Iceberg-style partitioned parquet tables (the sandbox has no Iceberg catalog;
layout and commit protocol mirror it):

- nodes/edges partitioned by ``graph_id`` → every query's `MATCH (g {id})`
  prefix becomes partition pruning (S12/S13, SURVEY.md §4)
- S10 CREATE = commit the incoming graph_id partitions; S11 MERGE =
  read-current-partition ∪ incoming → per-key precedence merge → commit that
  one partition (idempotent; COLUMN-wise merge on props — incoming non-null
  wins per column, mirroring Neo4j ``SET n += props`` which only overwrites
  provided keys; keep-existing-non-empty label/type on identity —
  neo4j_service.py:132-141)
- a ``_manifest`` table mirrors the reference's ``.processed_files`` ledger
  (auto_processor.py:843-883): one row per committed (stage, unit); re-runs
  skip committed units → the resume contract of the north rule.

Commit protocol (partition-scoped copy-on-write — the 100 TB shape):
partition data lives in immutable version dirs
``<root>/<table>/data/graph_id=<g>/v=<snap>/``; each snapshot is a tiny
manifest ``<root>/<table>/snapshot=<n>/_MANIFEST.json`` mapping every live
graph_id to its current version dir, plus a ``_COMMITTED`` marker written
last. A MERGE into one graph on a 10k-graph warehouse therefore writes ONE
partition's files and a manifest that re-references the other 9 999 —
no whole-table rewrite, exactly Iceberg's overwritePartitions/RewriteFiles.
DELETE is a manifest-only commit (zero data writes). A killed write is
invisible (readers only trust the marker), and reads pin the manifest's file
set, so concurrent commits never tear a scan.

Tables written with ``partition_by=()`` (raw_extract, triples, metrics, …)
keep whole-dir snapshots — they are per-run artifacts, not upsert targets.

Reads go through ``spark.read.option("basePath", …)`` over the manifest's
version dirs, so ``graph_id`` stays a partition column and `MATCH`-prefix
filters still prune at scan (pinned by test_graph_table_partition_pruning).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _unescape_partition(value: str) -> str:
    """Invert Hive/Spark partition-path escaping (%XX sequences)."""
    return unquote(value)


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

    def _data_dir(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "data")

    def _load_partition_manifest(self, table: str, snap: int) -> dict | None:
        mpath = os.path.join(self._snapshot_path(table, snap), "_MANIFEST.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)

    def _commit_partitions(
        self, table: str, df: DataFrame, *,
        replace_table: bool, sort_within: tuple[str, ...] = (),
        drop_ids: tuple[str, ...] = (),
        sub_partition: tuple[str, ...] = (),
    ) -> tuple[int, set[str]]:
        """Write df's graph_id partitions as immutable ``v=<snap>`` version
        dirs (ONE Spark job, partitionBy) and commit a manifest referencing
        them plus — unless ``replace_table`` — every untouched partition's
        existing files. ``drop_ids`` removes partitions manifest-only (a
        partition also present in df survives — written data wins).
        ``sub_partition`` adds secondary partition columns BELOW the version
        dir (``graph_id=g/v=n/<sub>=x/...``) — commit granularity stays per
        graph_id, while reads still prune on the sub keys (used by the entity
        token index, partitioned (graph_id, tok_prefix)).
        Returns (snapshot, graph_ids written)."""
        cur = self.current_snapshot(table)
        old = {}
        if cur is not None and not replace_table:
            m = self._load_partition_manifest(table, cur)
            if m is None:
                # Legacy whole-dir snapshot (pre-manifest layout): treating it
                # as an empty table would commit a manifest containing ONLY the
                # incoming graph_ids, silently dropping every other graph from
                # subsequent reads. Migrate the legacy snapshot through the
                # partitioned path first, then apply this incremental commit
                # on top of the migrated manifest.
                legacy = self.spark.read.parquet(self._snapshot_path(table, cur))
                self._commit_partitions(
                    table, legacy, replace_table=True, sub_partition=sub_partition
                )
                cur = self.current_snapshot(table)
                m = self._load_partition_manifest(table, cur)
            old = dict(m.get("partitions", {})) if m else {}
        snap = (cur + 1) if cur is not None else 0
        if sort_within:
            df = df.sortWithinPartitions(*sort_within)
        tmp = os.path.join(self._table_dir(table), f"_tmp-{snap}")
        df.write.mode("overwrite").partitionBy("graph_id", *sub_partition).parquet(tmp)
        changed: dict[str, str] = {}
        os.makedirs(self._data_dir(table), exist_ok=True)
        for name in sorted(os.listdir(tmp)):
            if not name.startswith("graph_id="):
                continue
            # manifest keys are the UNESCAPED graph_id (Spark hive-escapes
            # special chars in partition dir names: 'a/b' → 'a%2Fb')
            gid = _unescape_partition(name.split("=", 1)[1])
            part_dir = os.path.join(self._data_dir(table), name)
            os.makedirs(part_dir, exist_ok=True)
            dest = os.path.join(part_dir, f"v={snap}")
            # a crashed previous attempt (died before _COMMITTED) can leave
            # an unreferenced dest dir with this snap number — it is garbage
            # by construction (no committed manifest points at it), so
            # replace it instead of wedging every retry with ENOTEMPTY
            if os.path.exists(dest):
                shutil.rmtree(dest)
            os.rename(os.path.join(tmp, name), dest)
            changed[gid] = f"{name}/v={snap}"
        shutil.rmtree(tmp, ignore_errors=True)
        partitions = {
            g: p for g, p in old.items() if g not in changed and g not in drop_ids
        }
        partitions.update(changed)
        spath = self._snapshot_path(table, snap)
        os.makedirs(spath, exist_ok=True)
        manifest = {
            "partitions": partitions,
            "schema": df.schema.json(),
        }
        with open(os.path.join(spath, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        with open(os.path.join(spath, "_COMMITTED"), "w") as f:
            json.dump({"snapshot": snap, "committed_at": time.time()}, f)
        return snap, set(changed)

    def write_snapshot(self, table: str, df: DataFrame,
                       partition_by: tuple[str, ...] = ("graph_id",),
                       sort_within: tuple[str, ...] = ()) -> int:
        """Commit a new snapshot; returns the snapshot id. graph_id-partitioned
        tables go through the partition-scoped manifest commit (the whole df
        REPLACES the table — callers upserting a single graph use store_graph
        / store_graph_merge, which only rewrite affected partitions).
        Non-partitioned tables keep whole-dir snapshots; the _COMMITTED
        marker is written only after the parquet job succeeds, so partial
        writes never become visible (resume-safe).

        ``sort_within`` clusters rows inside each file (the poor man's
        Z-order): sorting nodes by node_id / edges by src tightens parquet
        min-max stats so point lookups and range scans skip row groups."""
        if partition_by[:1] == ("graph_id",):
            snap, _ = self._commit_partitions(
                table, df, replace_table=True, sort_within=sort_within,
                sub_partition=tuple(partition_by[1:]),
            )
            return snap
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

    def upsert_graph_partitions(
        self, table: str, df: DataFrame, *,
        sort_within: tuple[str, ...] = (),
        sub_partition: tuple[str, ...] = (),
        drop_ids: tuple[str, ...] = (),
    ) -> int:
        """Partition-scoped commit for DERIVED graph_id-partitioned tables
        (e.g. the entity token index): rewrites only df's graph_id
        partitions, carrying every other graph by manifest reference — the
        same incremental protocol nodes/edges use via store_graph.
        ``drop_ids`` partitions are dropped from the manifest unless df also
        writes them (written data wins) — pass the target graph_id when an
        empty rebuild must not leave a stale partition referenced."""
        snap, _ = self._commit_partitions(
            table, df, replace_table=False,
            sort_within=sort_within, sub_partition=sub_partition,
            drop_ids=drop_ids,
        )
        return snap

    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        snap = snapshot if snapshot is not None else self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        manifest = self._load_partition_manifest(table, snap)
        if manifest is None:
            return self.spark.read.parquet(self._snapshot_path(table, snap))
        return self._read_manifest_paths(table, manifest, list(manifest["partitions"]))

    def read_partition(self, table: str, graph_id: str,
                       snapshot: int | None = None) -> DataFrame | None:
        """Single-partition read (no scan of other graphs' files); None if the
        partition doesn't exist in the snapshot."""
        snap = snapshot if snapshot is not None else self.current_snapshot(table)
        if snap is None:
            return None
        manifest = self._load_partition_manifest(table, snap)
        if manifest is None:
            df = self.read(table, snap)
            return df.filter(F.col("graph_id") == graph_id)
        if graph_id not in manifest["partitions"]:
            return None
        return self._read_manifest_paths(table, manifest, [graph_id])

    def _read_manifest_paths(self, table: str, manifest: dict,
                             graph_ids: list[str]) -> DataFrame:
        parts = manifest["partitions"]
        paths = [os.path.join(self._data_dir(table), parts[g]) for g in graph_ids]
        if not paths:
            schema = T.StructType.fromJson(json.loads(manifest["schema"]))
            return self.spark.createDataFrame([], schema)
        df = (
            self.spark.read.option("basePath", self._data_dir(table))
            .option("mergeSchema", "true")
            .parquet(*paths)
        )
        return df.drop("v")

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    # --- graph API (S10-S13) ---------------------------------------------------

    def store_graph(self, nodes: DataFrame, edges: DataFrame) -> tuple[int, int]:
        """S10 CREATE semantics: commit the incoming graph_id partitions
        (replacing them if re-run — idempotent). Partitions of OTHER graphs
        are carried by manifest reference — zero data rewritten for them.

        Idempotency across BOTH tables: a graph_id present in either incoming
        frame is replaced in both — so re-running a graph whose edges (or
        nodes) frame came out empty drops the stale partition instead of
        leaving it referenced by the manifest (the written side's gids are
        passed as drop_ids to the other table's commit)."""
        _, node_gids = self._commit_partitions(
            "nodes", nodes, replace_table=False, sort_within=("node_id",)
        )
        _, edge_gids = self._commit_partitions(
            "edges", edges, replace_table=False, sort_within=("src", "dst"),
            drop_ids=tuple(sorted(node_gids)),
        )
        stale_node_gids = edge_gids - node_gids
        if stale_node_gids:
            self._drop_partitions("nodes", stale_node_gids)
        return (self.current_snapshot("nodes"), self.current_snapshot("edges"))

    def store_graph_merge(self, nodes: DataFrame, edges: DataFrame,
                          graph_id: str) -> None:
        """S11 MERGE upsert into one graph_id partition
        (neo4j_service.py:76-188) — reads and rewrites ONLY that partition:

        nodes — `MERGE (n:Node {id})`: on-create take incoming row; on-match
        keep existing non-empty label/type/entity_class, and merge value
        columns COLUMN-wise — incoming non-null wins, existing value is kept
        where the incoming column is null (Neo4j ``SET n += props`` only
        overwrites provided keys).
        edges — `MERGE (s)-[r]->(t)` keyed (src, dst, rel_type): incoming
        row wins.
        """
        inc_nodes = nodes.withColumn("graph_id", F.lit(graph_id))
        inc_edges = edges.withColumn("graph_id", F.lit(graph_id))

        old_part = self.read_partition("nodes", graph_id) if self.exists("nodes") else None
        if old_part is not None:
            merged = self._merge_node_partition(old_part, inc_nodes)
            self._commit_partitions(
                "nodes", merged, replace_table=False, sort_within=("node_id",)
            )
        else:
            self._commit_partitions(
                "nodes", inc_nodes, replace_table=False, sort_within=("node_id",)
            )

        old_part_e = self.read_partition("edges", graph_id) if self.exists("edges") else None
        if old_part_e is not None:
            both_e = old_part_e.withColumn("_prio", F.lit(1)).unionByName(
                inc_edges.withColumn("_prio", F.lit(2)), allowMissingColumns=True
            )
            w = Window.partitionBy("src", "dst", "rel_type").orderBy(
                F.desc("_prio"), "edge_id"
            )
            merged_e = (
                both_e.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_prio")
            )
            self._commit_partitions(
                "edges", merged_e, replace_table=False, sort_within=("src", "dst")
            )
        else:
            self._commit_partitions(
                "edges", inc_edges, replace_table=False, sort_within=("src", "dst")
            )

    @staticmethod
    def _merge_node_partition(old_part: DataFrame, inc: DataFrame) -> DataFrame:
        """Column-wise node upsert: old/new rows pivot into one row per
        node_id, then identity columns keep the existing non-empty value and
        every other column coalesces incoming-first."""
        both = old_part.withColumn("_prio", F.lit(1)).unionByName(
            inc.withColumn("_prio", F.lit(2)), allowMissingColumns=True
        )
        cols = [c for c in both.columns if c not in ("node_id", "_prio")]
        ident_cols = [c for c in ("label", "type", "entity_class") if c in cols]
        row = F.struct(*cols)
        pivoted = both.groupBy("node_id").agg(
            F.max(F.when(F.col("_prio") == 1, row)).alias("o"),
            F.max(F.when(F.col("_prio") == 2, row)).alias("n"),
        )

        def merged_col(c):
            o, n = F.col(f"o.{c}"), F.col(f"n.{c}")
            if c in ident_cols:
                # keep existing label/type when present and non-empty
                return F.when(
                    o.isNotNull() & (F.trim(o) != ""), o
                ).otherwise(n).alias(c)
            return F.coalesce(n, o).alias(c)

        return pivoted.select("node_id", *[merged_col(c) for c in cols])

    def get_graph(self, graph_id: str, node_limit: int = 1000,
                  edge_limit: int = 2000) -> tuple[DataFrame, DataFrame]:
        """S12 read caps (neo4j_service.py:190): partition-pruned scans."""
        n = self.read("nodes").filter(F.col("graph_id") == graph_id).limit(node_limit)
        e = self.read("edges").filter(F.col("graph_id") == graph_id).limit(edge_limit)
        return n, e

    def list_graphs(self) -> list[str]:
        """S13: distinct graph ids — manifest keys, no Spark job
        (SHOW PARTITIONS analogue)."""
        if not self.exists("nodes"):
            return []
        snap = self.current_snapshot("nodes")
        manifest = self._load_partition_manifest("nodes", snap)
        if manifest is not None:
            return sorted(manifest["partitions"])
        return sorted(
            r.graph_id
            for r in self.read("nodes").select("graph_id").distinct().collect()
        )

    def _drop_partitions(self, table: str, graph_ids) -> None:
        """Manifest-only commit removing partitions — no data files read or
        written. Legacy (manifest-less) snapshots fall back to a filtered
        rewrite through the partitioned path."""
        cur = self.current_snapshot(table)
        manifest = self._load_partition_manifest(table, cur)
        if manifest is None:
            self.write_snapshot(
                table,
                self.read(table).filter(~F.col("graph_id").isin(*graph_ids)),
            )
            return
        snap = cur + 1
        for gid in graph_ids:
            manifest["partitions"].pop(gid, None)
        spath = self._snapshot_path(table, snap)
        os.makedirs(spath, exist_ok=True)
        with open(os.path.join(spath, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        with open(os.path.join(spath, "_COMMITTED"), "w") as f:
            json.dump({"snapshot": snap, "committed_at": time.time()}, f)

    def delete_graph(self, graph_id: str) -> None:
        """S13 DETACH DELETE: manifest-only commit dropping the partition —
        no data files read or written. Derived per-graph tables (the entity
        token index, operators/retrieval.py) are dropped too, so a deleted
        graph can't leave dangling index rows behind."""
        for table in ("nodes", "edges", "entity_index"):
            if not self.exists(table):
                continue
            self._drop_partitions(table, (graph_id,))

    def compact_partition(self, table: str, graph_id: str,
                          target_files: int = 1,
                          sort_within: tuple[str, ...] = (),
                          sub_partition: tuple[str, ...] = ()) -> None:
        """Iceberg ``rewrite_data_files`` analogue: rewrite one partition's
        accumulated small files (every incremental commit adds up to
        shuffle-partition-count files) into ``target_files``, committed as a
        normal snapshot. Content is unchanged; pair with vacuum() to reclaim
        the superseded version dirs. For sub-partitioned tables (the entity
        index) pass the same ``sub_partition`` the table was written with, or
        the rewrite would flatten the sub-partition dirs and lose those
        columns (they live in the directory names, not the files)."""
        cur = self.current_snapshot(table)
        if cur is None or self._load_partition_manifest(table, cur) is None:
            # a legacy whole-dir snapshot has no partition manifest; a
            # partial commit here would silently drop every other graph_id
            raise ValueError(
                f"table {table} has no partition manifest — rewrite it via "
                "write_snapshot(partition_by=('graph_id',)) before compacting"
            )
        part = self.read_partition(table, graph_id)
        if part is None:
            raise FileNotFoundError(f"no partition {graph_id} in {table}")
        if sub_partition:
            # coalesce per sub-partition value, not across them
            part = part.repartition(target_files, *sub_partition)
        else:
            part = part.coalesce(target_files)
        self._commit_partitions(
            table, part,
            replace_table=False, sort_within=sort_within,
            sub_partition=sub_partition,
        )

    def vacuum(self, table: str, keep_last: int = 2) -> list[str]:
        """Iceberg ``expire_snapshots`` analogue: delete partition version
        dirs referenced by NO surviving snapshot manifest, keeping the last
        ``keep_last`` committed snapshots (older snapshot dirs are dropped
        too). Readers pinned to a surviving snapshot are unaffected — data
        files are immutable and only unreferenced versions are removed.
        Returns the deleted version-dir paths."""
        snaps = self._snapshots(table)
        if not snaps:
            return []
        keep = snaps[-keep_last:] if keep_last > 0 else snaps[-1:]
        live: set[str] = set()
        legacy_only = False
        for snap in keep:
            m = self._load_partition_manifest(table, snap)
            if m is None:
                legacy_only = True
                continue
            live.update(m.get("partitions", {}).values())
        deleted: list[str] = []
        data = self._data_dir(table)
        if os.path.isdir(data) and not legacy_only:
            for part in sorted(os.listdir(data)):
                pdir = os.path.join(data, part)
                if not (os.path.isdir(pdir) and part.startswith("graph_id=")):
                    continue
                for ver in sorted(os.listdir(pdir)):
                    rel = f"{part}/{ver}"
                    if ver.startswith("v=") and rel not in live:
                        shutil.rmtree(os.path.join(pdir, ver), ignore_errors=True)
                        deleted.append(rel)
                if not os.listdir(pdir):
                    os.rmdir(pdir)
        for snap in snaps:
            if snap not in keep:
                shutil.rmtree(self._snapshot_path(table, snap), ignore_errors=True)
        return deleted

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

    def stage_meta(self, stage: str, unit: str = "") -> dict | None:
        """The metadata recorded by mark_done for one stage, or None."""
        return self._load_manifest().get(f"{stage}::{unit}")

    def completed_stages(self) -> list[str]:
        return sorted(self._load_manifest())
