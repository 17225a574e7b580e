"""knowledge_graph_rag_spark — a PySpark-native knowledge-graph construction engine.

Brand-new implementation of the query / data-processing capabilities of the
reference repo Sagar4276/Knowledge-Graph-RAG (surveyed in /root/repo/SURVEY.md),
re-expressed Spark-first:

- interleaved text+media document tables (doc_id, spans) as the primary input
- vectorized (Arrow/pandas-UDF) mention + triple extraction with a closed
  entity/relation vocabulary
- alias-dictionary + embedding-similarity entity linking, MinHash-LSH and
  connected-components canonicalization
- partitioned nodes/edges graph tables with MERGE-upsert semantics
- the reference's 13-template query pack + anomaly detectors as DataFrame plans
- training-data-pipeline operators (dedup, similarity search, text quality)

Everything is DataFrame/SQL (Catalyst-optimized); Python appears only inside
Arrow-batched pandas UDFs at the four sites listed in SURVEY.md §2.11.
"""

__version__ = "0.1.0"
