"""Hub-entity skew: the synth corpus's Zipf sampling must actually produce
hubs, and the salted aggregation path must agree with the plain one on them
(SURVEY.md §7 'what's hard' e)."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_rag_spark import synth
from knowledge_graph_rag_spark.operators import extract as X

N_DOCS = 400


@pytest.fixture(scope="module")
def raw(spark):
    r = X.extract_raw(X.explode_spans(synth.documents_df(spark, N_DOCS))).cache()
    r.count()
    return r


def test_zipf_hubs_exist(spark, raw):
    counts = X.mention_doc_sets(spark, raw, salted=False).collect()
    orgs = sorted(
        (r for r in counts if r.type == "Organization"),
        key=lambda r: -r.n_docs,
    )
    # head Organization in a large share of docs (FIXTURES.md: ~10%+)
    assert orgs[0].n_docs >= 0.10 * N_DOCS, orgs[0]
    # heavy head-vs-tail ratio: the skew is real
    assert orgs[0].n_docs >= 5 * max(orgs[-1].n_docs, 1)
    ips = sorted(
        (r for r in counts if r.type == "ExternalIP"), key=lambda r: -r.n_docs
    )
    assert ips and ips[0].n_docs >= 0.05 * N_DOCS


def test_salted_equals_plain_on_hubs(spark, raw):
    plain = {
        (r.label, r.type): (r.n_docs, r.n_mentions)
        for r in X.mention_doc_sets(spark, raw, salted=False).collect()
    }
    salted = {
        (r.label, r.type): (r.n_docs, r.n_mentions)
        for r in X.mention_doc_sets(spark, raw, salted=True).collect()
    }
    assert plain == salted


def test_salted_plan_has_two_phase_shape(spark, raw):
    """The salted plan aggregates on (key, salt) before the final key agg —
    two hash-partitioned exchanges instead of one hot one."""
    import re

    df = X.mention_doc_sets(spark, raw, salted=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "_salt" in plan
    # two aggregation families (per-(key,salt) then per-key), each with its
    # partial+final pair → ≥4 aggregate nodes (AQE hides Exchanges pre-exec)
    aggs = re.findall(r"\(\d+\) (?:ObjectHash|Hash|Sort)Aggregate\b", plan)
    assert len(aggs) >= 4, aggs
