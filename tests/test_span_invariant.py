"""Input-hint invariant: per doc_id the exploded (kind, text, media_ref,
order) sequence equals the reference/oracle sequence exactly."""

from pyspark.sql import functions as F

from knowledge_graph_rag_spark import oracle, synth
from knowledge_graph_rag_spark.operators.extract import explode_spans

N_DOCS = 120


def test_span_sequence_equality(spark):
    docs_df = synth.documents_df(spark, N_DOCS)
    got = {
        (r.doc_id, r.span_order): (r.kind, r.text, r.media_ref)
        for r in explode_spans(docs_df).collect()
    }
    for i in range(N_DOCS):
        doc = synth.gen_doc(i)
        for kind, text, media_ref, order in oracle.span_sequence(doc):
            assert got[(doc["doc_id"], order)] == (kind, text, media_ref), (
                doc["doc_id"], order,
            )
    # cardinality match: no extra spans on the Spark side
    assert len(got) == sum(len(synth.gen_doc(i)["spans"]) for i in range(N_DOCS))


def test_offsets_strictly_increasing(spark):
    docs_df = synth.documents_df(spark, N_DOCS)
    bad = (
        explode_spans(docs_df)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("offset").alias("d"),
            F.min(F.col("offset")).alias("mn"),
        )
        .filter((F.col("n") != F.col("d")) | (F.col("mn") != 0))
        .count()
    )
    assert bad == 0
