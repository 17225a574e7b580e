"""Generate frozen-literal VALUES oracles for deterministic rows-only entries.

Runs the named driver entries TWICE — once on the repo's configured session
and once on a bare (driver-like) session — at sf0.01, and for entries whose
results are identical across both sessions, prints a DuckDB VALUES oracle
ready to paste into plans/driver_queries.py. Entries that differ between
sessions are reported as UNSTABLE and must stay rows-only.

Usage: python tools/freeze_oracles.py [entry ...]
"""

from __future__ import annotations

import subprocess
import sys

SF_DIR = "/root/testdata/sf0.01"

DEFAULT_ENTRIES = [
    "doc_file_sources",
    "media_span_manifest",
    "entity_pagerank",
    "ml_anomaly_flags",
    "winnow_passage_pairs",
    "minhash_surface_candidates",
    "ivf_topk_ann",
    "kg_node_summary",
    "template_exploit_preparation",
    "template_network_topology",
    "graph_anomaly_detect_all",
    "docpack_attack_surface",
]

_CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
mode, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
if mode == "configured":
    from knowledge_graph_rag_spark.session import get_spark
    spark = get_spark()
else:
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[8]").getOrCreate()
from knowledge_graph_rag_spark.plans import driver_queries as DQ
qs = DQ.extended_queries()
out = {}
for name in names:
    df = qs[name](spark, sf_dir)
    rows = [list(r) for r in df.collect()]
    out[name] = {
        "schema": [(f.name, f.dataType.simpleString()) for f in df.schema.fields],
        "rows": rows,
    }
print("FREEZE_JSON:" + json.dumps(out))
"""


def _run(mode: str, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, mode, SF_DIR, *names],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("FREEZE_JSON:"):
            import json

            return json.loads(line[len("FREEZE_JSON:"):])
    raise RuntimeError(f"{mode} child failed:\n{p.stdout[-3000:]}\n{p.stderr[-3000:]}")


def _lit(v, dtype: str) -> str:
    if v is None:
        cast = {"string": "VARCHAR", "double": "DOUBLE", "float": "DOUBLE"}.get(
            dtype, "BIGINT"
        )
        return f"NULL::{cast}"
    if dtype == "string":
        return "'" + str(v).replace("'", "''") + "'"
    if dtype in ("double", "float"):
        return f"{v!r}::DOUBLE"
    if dtype == "boolean":
        return "TRUE" if v else "FALSE"
    return f"{v}::BIGINT"


def emit(name: str, schema: list, rows: list) -> str:
    cols = ", ".join(c for c, _ in schema)
    body = ",\n".join(
        "      (" + ", ".join(_lit(v, dt) for v, (_, dt) in zip(r, schema)) + ")"
        for r in rows
    )
    return (
        f"-- {name}: {len(rows)} rows\n"
        f'    """\n    SELECT * FROM (VALUES\n{body}\n'
        f'    ) AS t({cols})\n    """'
    )


def main() -> None:
    names = sys.argv[1:] or DEFAULT_ENTRIES
    a = _run("configured", names)
    b = _run("vanilla", names)
    for name in names:
        if a[name] != b[name]:
            ra, rb = a[name]["rows"], b[name]["rows"]
            diff = [
                (x, y) for x, y in zip(ra, rb) if x != y
            ][:3]
            print(f"### {name}: UNSTABLE across sessions "
                  f"({len(ra)} vs {len(rb)} rows; first diffs {diff}) — keep rows-only\n")
            continue
        print(f"### {name}: stable ({len(a[name]['rows'])} rows)")
        print(emit(name, a[name]["schema"], a[name]["rows"]))
        print()


if __name__ == "__main__":
    main()
