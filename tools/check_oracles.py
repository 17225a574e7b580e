"""Local replica of the driver's correctness check — STRICTER and WIDER than
the driver: every registered entry (the 50-entry driver window, in driver
order, PLUS the extended set) runs on Spark with its oracle_sql() on DuckDB
at sf0.01, comparing row count, sorted column names, an order-insensitive
value hash, AND per-column numeric kinds (int vs float vs object) — the r01
driver caught a DuckDB HUGEINT-vs-Spark long mismatch that the old
stringify-only hash missed. Rows-only entries are additionally pushed through
a pandas sort_values canonicalization that mirrors the driver's (so
array-typed columns fail here, not in CORRECTNESS). Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from knowledge_graph_rag_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _kind(v):
    """Numeric kind tag for a python/numpy scalar: i / f / b / s / null."""
    if v is None:
        return "-"
    if isinstance(v, bool):
        return "b"
    if isinstance(v, float):
        return "-" if math.isnan(v) else "f"
    if isinstance(v, int):
        return "i"
    if isinstance(v, Decimal):
        return "f"
    # numpy scalars expose .dtype.kind
    k = getattr(getattr(v, "dtype", None), "kind", None)
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    return "s"


def col_kinds(rows: list[tuple], cols: list[str]) -> dict[str, str]:
    """Dominant non-null kind per column (dtype-level check across engines)."""
    out = {}
    for i, c in enumerate(cols):
        kinds = {_kind(r[i]) for r in rows} - {"-"}
        out[c] = "".join(sorted(kinds)) or "-"
    return out


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def _norm(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return "∅" if math.isnan(v) else f"{v:.6g}"
    return str(v)


def _driver_canon_ok(sdf) -> str | None:
    """Mirror the driver's rows-only canonicalization: toPandas + sort_values
    over every column. Returns an error string if it would crash there."""
    try:
        pdf = sdf.toPandas()
        pdf = pdf[sorted(pdf.columns)]
        pdf.astype(str).sort_values(list(pdf.columns))
        # the driver sorts the raw frame — lists/dicts are unhashable there
        pdf.sort_values(list(pdf.columns))
    except Exception as ex:  # noqa: BLE001
        return f"{type(ex).__name__}: {ex}"
    return None


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    import __spark_entry__ as E

    if vanilla:
        # the driver's surface: a bare SparkSession with NONE of session.py's
        # config — catches anything the library silently depends on
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # verify EVERYTHING registered — the driver window (exactly the 50
    # entries the external driver checks, asserted here) plus the extended
    # set — with identical rigor
    from knowledge_graph_rag_spark.plans import driver_queries as DQ

    driver_qs = E.queries()
    assert len(driver_qs) == 50, f"driver window must be 50, got {len(driver_qs)}"
    assert set(E.oracle_sql()) <= set(driver_qs)
    qs, oracles = DQ.extended_queries(), DQ.extended_oracle_sql()
    # driver-window entries first, same order the driver sees
    qs = {**{n: qs[n] for n in driver_qs}, **qs}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            err = _driver_canon_ok(sdf)
            if err:
                print(f"FAIL {name}: driver canonicalizer would crash: {err}")
                failures += 1
            else:
                print(f"ok(rows-only) {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = rel.columns
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sk, dk = col_kinds(srows, scols), col_kinds(drows, dcols)
            bad = {c for c in sk if sk[c] != dk[c] and "-" not in (sk[c], dk[c])}
            if bad:
                problems.append(
                    "dtype-kind " + ", ".join(f"{c}: {sk[c]} vs {dk[c]}" for c in sorted(bad))
                )
        if not problems:
            sh = value_hash(srows, scols)
            dh = value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"value-hash {sh} vs {dh}")
                sset = {tuple(map(str, r)) for r in srows}
                dset = {tuple(map(str, r)) for r in drows}
                print("   only-spark:", list(sset - dset)[:3])
                print("   only-duck :", list(dset - sset)[:3])
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok {name}: {len(srows)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
