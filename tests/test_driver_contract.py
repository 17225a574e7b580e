"""Static checks on the driver contract surface (no Spark needed)."""

import sys

sys.path.insert(0, "/root/repo")


def test_every_oracle_has_query():
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 25  # oracle-checked breadth
    assert len(qs) >= 30
    for name, sql in os_.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_rows_only_entries_documented():
    import __spark_entry__ as E

    rows_only = set(E.queries()) - set(E.oracle_sql())
    # every rows-only entry is a genuinely non-SQL-expressible op
    assert rows_only == {
        "kg_triples", "kg_node_summary", "minhash_surface_candidates",
        "media_span_manifest", "template_exploit_preparation",
        "template_network_topology", "graph_anomaly_detect_all",
        "docpack_attack_surface", "doc_file_sources", "ml_anomaly_flags",
        "ivf_topk_ann", "csv_ingest_formats", "merge_graph_stats",
        "entity_pagerank", "winnow_passage_pairs",
    }
