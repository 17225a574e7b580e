"""Generate PLANS.md: annotated `.explain("formatted")` dumps of the flagship
plans, as scale evidence for review. Usage: python tools/dump_plans.py"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from knowledge_graph_rag_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _library_ngram_windowed_stage(spark, sf):
    """The library op's plan up to the grouped-bucket table (its
    localCheckpoint truncates lineage downstream, which would hide the
    Window from the final collected plan)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from knowledge_graph_rag_spark.operators.dedup import word_shingles

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").alias("id"), "text"
    )
    sh = word_shingles(docs, "id", "text", 3)
    w = Window.partitionBy("shingle")
    sh_ok = sh.withColumn("df", F.count("*").over(w)).filter(
        F.col("df") <= 100
    ).drop("df")
    return sh_ok.groupBy("shingle").agg(
        F.sort_array(F.collect_set("id")).alias("ids")
    )


def main() -> None:
    from knowledge_graph_rag_spark import synth
    from knowledge_graph_rag_spark.operators import extract as X
    from knowledge_graph_rag_spark.operators import graph_build as GB
    from knowledge_graph_rag_spark.operators import network as N
    from knowledge_graph_rag_spark.operators import querypack as Q
    from knowledge_graph_rag_spark.plans import driver_queries as DQ

    spark = get_spark(cores=4)
    sections = []

    triples = X.extract_triples(spark, synth.documents_df(spark, 64))
    sections.append((
        "KG triple extraction (documents → triples)",
        "One Python site (MapInPandas ×2: generate + extract); four "
        "BroadcastExchange for the alias/semantic/direction dictionaries — "
        "no SortMergeJoin anywhere; the single hash Exchange is the final "
        "dedup on (doc_id, subj, pred, obj). At 10^12 docs everything except "
        "that dedup is embarrassingly parallel.",
        plan_of(triples),
    ))

    conns = N.score_connections(N.parse_logs(synth.network_logs_df(spark, 300)))
    nodes = GB.telemetry_nodes(conns, "g")
    edges = GB.telemetry_edges(conns, "g")
    sections.append((
        "exploit_preparation (A17 flagship template)",
        "Two-level aggregation (per-(ip,port) then per-ip), a single window "
        "for the per-ip top-3 restricted by left_semi to survivors, and "
        "TakeOrderedAndProject for the LIMIT 10 — no global sort.",
        plan_of(Q.exploit_preparation(nodes, edges)),
    ))

    sections.append((
        "pricing_summary (pushdown showcase)",
        "PushedFilters carries the shipdate predicate into the parquet scan; "
        "ReadSchema is pruned to the 5 referenced columns; partial+final "
        "HashAggregate pair (map-side combine).",
        plan_of(DQ.pricing_summary(spark, SF)),
    ))

    sections.append((
        "top_talkers (top-k template)",
        "TakeOrderedAndProject: distributed top-k, no full sort.",
        plan_of(DQ.top_talkers(spark, SF)),
    ))

    sections.append((
        "ngram_jaccard_pairs (bench/driver entry — delegates to the library op)",
        "Since r05 the bench path IS operators/dedup.ngram_jaccard_pairs "
        "(no inline twin): bucket-explode pair generation (not a shingle "
        "self-join), df ≤ 100 windowed cap, NO broadcast hints on the "
        "per-doc size joins — `sizes` has one row per document, unbounded "
        "at the design point (AQE may still choose a broadcast at small SF "
        "from runtime stats, which is the right call there and impossible "
        "to hardcode safely at 100 TB). The bucketed table is checkpointed "
        "once and feeds sizes + pair agg; the Window stage is hidden here "
        "behind the checkpoint — see the next section for it.",
        plan_of(DQ.extended_queries()["ngram_jaccard_pairs"](spark, SF)),
    ))

    sections.append((
        "ngram_jaccard_pairs LIBRARY op, pre-checkpoint window stage",
        "The df ≤ max_df hot-shingle cap is a count() over "
        "Window.partitionBy(shingle), so its Exchange is SHARED with the "
        "downstream groupBy(shingle) (same hash partitioning — the Window "
        "and HashAggregate stack on one shuffle), per-key state is a "
        "spill-backed sort buffer (a 10^9-df stop-phrase spills and is "
        "filtered, never an unbounded in-memory set), and there is NO "
        "broadcast of the unbounded-cardinality hot set. Shown pre-"
        "checkpoint so the Window stage is visible. Note the projected "
        "token-array column feeding the gram lambda: materializing it keeps "
        "the regex tokenization O(len) per row (inlined, each per-element "
        "F.get re-evaluated the split — measured 6× on the sf0.1 bench).",
        plan_of(_library_ngram_windowed_stage(spark, SF)),
    ))

    sections.append((
        "triangle_count_graph (degree-ordered triangle enumeration)",
        "Suri-Vassilvitskii shape: canonical undirected edges feed a degree "
        "aggregation, every edge is oriented low→high (degree, node) rank, "
        "wedges enumerate only at each edge's low-rank endpoint, and a "
        "left_semi against the oriented edge set closes them — three hash "
        "joins + two aggregations, no iteration, and the hub key that would "
        "curse the last reducer in a naive enumeration never forms.",
        plan_of(DQ.extended_queries()["triangle_count_graph"](spark, SF)),
    ))

    sections.append((
        "token_budget_sample_mix (per-language token-budget selection)",
        "One Exchange on the language + a per-language sort for the "
        "exclusive running-sum window (spill-backed state), then the budget "
        "filter and the mix aggregation — hash-priority order makes the "
        "kept set partition/cluster/engine-independent.",
        plan_of(DQ.extended_queries()["token_budget_sample_mix"](spark, SF)),
    ))

    sections.append((
        "session_counts (gaps-and-islands sessionization)",
        "lag + running-sum island ids share ONE Exchange + sort on "
        "(user_id; ts, event_id) — both Window operators reuse the same "
        "partitioning, then two hash aggregates roll sessions up.",
        plan_of(DQ.session_counts(spark, SF)),
    ))

    sections.append((
        "benchmark_decontamination (eval-set n-gram overlap)",
        "Corpus shingles are marked against the benchmark gram set with a "
        "BROADCAST left join (an eval suite is bounded; distinct benchmark "
        "grams mean each corpus shingle matches at most one row — no "
        "hot-key blow-up), so the only shuffles are the two shingle "
        "distincts and the per-doc rollup. Both doc_id % 97 slice filters "
        "are pushed into the parquet scans (DataFilters).",
        plan_of(DQ.extended_queries()["benchmark_decontamination"](spark, SF)),
    ))

    sections.append((
        "pii_redaction_stats (regexp count + redact, per-lang rollup)",
        "Every PII pattern is a native regexp Column expr, so detection AND "
        "redaction sit in ONE narrow codegen stage over the scan; the "
        "single Exchange is the per-language aggregation. No Python eval, "
        "no join — the shape a 100 TB scrub pass needs.",
        plan_of(DQ.extended_queries()["pii_redaction_stats"](spark, SF)),
    ))

    def _kcore_one_round(spark, sf):
        """One peel round of operators.graphalgs.kcore, pre-checkpoint (the
        eager per-round checkpoints hide the shape from the converged
        result's plan)."""
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf}/lineitem.parquet").filter(
            F.col("l_suppkey") % 3 == 0
        )
        e = (
            li.select(
                (F.col("l_orderkey") % 30000).alias("u"),
                (F.col("l_partkey") % 30000).alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
        )
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        bad = deg.filter(F.col("d") < 3).select("n")
        return e.join(bad.withColumnRenamed("n", "u"), "u", "left_anti").join(
            bad.withColumnRenamed("n", "v"), "v", "left_anti"
        )

    sections.append((
        "kcore — ONE peel round, pre-checkpoint",
        "Per round: one union + hash aggregation for degrees, then two "
        "anti-joins dropping sub-k endpoints. The bad set carries NO "
        "broadcast hint — first rounds can peel a large graph fraction, so "
        "the choice is left to Catalyst's size estimate: at this dump's "
        "tiny SF it auto-broadcasts (correct here), at scale the same plan "
        "falls back to shuffled anti-joins on the endpoint keys. The "
        "per-round eager localCheckpoint truncates lineage so round r+1 "
        "plans O(1) work, not O(r).",
        plan_of(_kcore_one_round(spark, SF)),
    ))

    sections.append((
        "lm_quality_scores (corpus bigram LM, CCNet-style)",
        "The checkpointed bigram stream feeds the count aggregation and the "
        "scoring join once; prefix counts derive from the AGGREGATED bigram "
        "counts (c(w1·) = Σ_w2 c(w1 w2)) — never a second corpus pass; "
        "vocabulary size rides as a broadcast 1-row aggregate. Count tables "
        "join on token keys (unbounded vocabulary, no broadcast, no "
        "collect).",
        plan_of(DQ.extended_queries()["lm_quality_scores"](spark, SF)),
    ))

    sections.append((
        "clustering_coefficients (per-node triangles, iterationless)",
        "Degree-ordered wedge enumeration with an INNER closing join that "
        "keeps the wedge corner: every triangle surfaces once as its three "
        "corners, one explode attributes it per node — the same "
        "last-reducer-curse defense as triangle_count, no iteration.",
        plan_of(DQ.extended_queries()["clustering_coefficients"](spark, SF)),
    ))

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan evidence (`explain(\"formatted\")`)\n\n"
            "Generated by `python tools/dump_plans.py`; the properties below\n"
            "are pinned as assertions in `tests/test_plan_quality.py`.\n"
        )
        for title, note, plan in sections:
            f.write(f"\n## {title}\n\n{note}\n\n```\n{plan}\n```\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
