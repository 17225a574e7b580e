"""Canonical StructTypes for every table the engine reads or writes.

Mapping from the reference's dict shapes to typed columns is documented in
SURVEY.md §1.2. The interleaved-documents schema is the BASELINE.json
input_hint verbatim.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Primary input: interleaved text+media documents ------------------------
# (doc_id:string, spans:array<struct<kind,text,media_ref,offset:int32>>)

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_INTERLEAVED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), False),
    ]
)

# --- Network log entry (reference models/network_models.py:37-51) -----------

NETWORK_LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("source_ip", T.StringType(), True),
        T.StructField("dest_ip", T.StringType(), True),
        T.StructField("source_port", T.IntegerType(), True),
        T.StructField("dest_port", T.IntegerType(), True),
        T.StructField("protocol", T.StringType(), True),
        T.StructField("bytes_sent", T.LongType(), True),
        T.StructField("bytes_received", T.LongType(), True),
        T.StructField("duration", T.DoubleType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("attack_type", T.StringType(), True),
    ]
)

# --- Parsed connection (network_parser.py:108-134 derived columns) ----------

CONNECTION_SCHEMA = T.StructType(
    list(NETWORK_LOG_SCHEMA.fields)
    + [
        T.StructField("conn_id", T.StringType(), False),
        T.StructField("source_is_internal", T.BooleanType(), False),
        T.StructField("dest_is_internal", T.BooleanType(), False),
        T.StructField("service", T.StringType(), False),
        T.StructField("is_suspicious_port", T.BooleanType(), False),
    ]
)

# --- Mentions / triples (extraction IR) -------------------------------------

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("surface", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
    ]
)

RAW_TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj_surface", T.StringType(), False),
        T.StructField("pred_surface", T.StringType(), False),
        T.StructField("obj_surface", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
    ]
)

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_type", T.StringType(), False),
        T.StructField("confidence", T.DoubleType(), False),
    ]
)

# --- Materialized graph tables (FIXTURES.md F3) -----------------------------

NODES_SCHEMA = T.StructType(
    [
        T.StructField("graph_id", T.StringType(), False),
        T.StructField("node_id", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("entity_class", T.StringType(), True),
        T.StructField("is_internal", T.BooleanType(), True),
        T.StructField("is_attacker", T.BooleanType(), True),
        T.StructField("is_anomaly", T.BooleanType(), True),
        T.StructField("anomaly_score", T.DoubleType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("severity", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("connection_count", T.LongType(), True),
        T.StructField("anomaly_types", T.ArrayType(T.StringType()), True),
        T.StructField("attack_types", T.ArrayType(T.StringType()), True),
        T.StructField("sources", T.ArrayType(T.StringType()), True),
        T.StructField("graph_origins", T.ArrayType(T.StringType()), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("graph_id", T.StringType(), False),
        T.StructField("edge_id", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("rel_type", T.StringType(), False),
        T.StructField("edge_class", T.StringType(), True),
        T.StructField("protocol", T.StringType(), True),
        T.StructField("port", T.IntegerType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("is_anomaly", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# --- Lineage / metrics table (north rule: per-partition lineage rows) -------

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)
