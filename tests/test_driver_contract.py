"""Static checks on the driver contract surface (no Spark needed)."""

import sys

sys.path.insert(0, "/root/repo")


def test_driver_window_is_exactly_50():
    """The external driver verifies the first 50 queries() entries in dict
    order (observed r02) — the window must hold exactly 50 so every exported
    entry gets driver-surface verification."""
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) == 50
    assert set(os_) <= set(qs)
    assert len(os_) >= 40  # oracle-checked breadth inside the window
    for name, sql in os_.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name
    # newest / previously-unverified entries lead the window
    first = list(qs)[:6]
    assert first[0] == "kg_triples"
    assert {"ngram_jaccard_pairs", "knn_bruteforce", "label_centroid_summary"} <= set(
        first
    )


def test_extended_registry_superset():
    """Everything in the driver window is also in the extended local gate,
    and the extended set keeps the consolidated/near-duplicate entries."""
    import __spark_entry__ as E
    from knowledge_graph_rag_spark.plans import driver_queries as DQ

    ext_q, ext_o = DQ.extended_queries(), DQ.extended_oracle_sql()
    assert set(E.queries()) <= set(ext_q)
    assert set(E.oracle_sql()) <= set(ext_o)
    # the set-op shapes consolidated into set_ops_summary stay oracle-checked
    assert {"active_users_union", "user_type_intersect", "high_value_except"} <= set(
        ext_o
    )
    for name, sql in ext_o.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_rows_only_entries_documented():
    import __spark_entry__ as E
    from knowledge_graph_rag_spark.plans import driver_queries as DQ

    rows_only = set(E.queries()) - set(E.oracle_sql())
    # every rows-only entry is a genuinely non-SQL-expressible op
    assert rows_only == {
        "kg_triples", "minhash_surface_candidates", "media_span_manifest",
        "doc_file_sources", "ml_anomaly_flags", "ivf_topk_ann",
        "entity_pagerank", "winnow_passage_pairs",
    }
    ext_rows_only = set(DQ.extended_queries()) - set(DQ.extended_oracle_sql())
    assert rows_only <= ext_rows_only
    assert ext_rows_only - rows_only == {
        "kg_node_summary", "template_exploit_preparation",
        "template_network_topology", "graph_anomaly_detect_all",
        "docpack_attack_surface",
    }
