"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``knowledge_graph_rag_spark.plans.driver_queries``
(one entry per operator family from SURVEY.md §2) — this file stays a thin
adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knowledge_graph_rag_spark.plans import driver_queries as DQ  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-star KG construction slice — interleaved documents
    → vectorized mention/triple extraction → canonical typed triples
    (SURVEY.md §7 stage 1). Returns the triples DataFrame."""
    return DQ.kg_triples(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return DQ.queries()


def oracle_sql() -> dict[str, str]:
    return DQ.oracle_sql()
