"""Physical-plan audit — the scale-readiness gate.

For each audited query, prints whether the plan shows:

* **PushedFilters** — predicates reached the Parquet scan;
* **pruned ReadSchema** — the scan reads only referenced columns;
* **WholeStageCodegen** — expressions run in generated JVM code;
* join strategies chosen (broadcast vs. shuffle) and exchange count.

Usage::

    python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphdb_testing_spark import datasets  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    # Explain with AQE off: AdaptiveSparkPlan hides WholeStageCodegen
    # ids until execution, which made every exchange-bearing plan look
    # codegen-free.  The physical plan is (re)derived at explain time,
    # so toggling the conf here is enough.
    sess = df.sparkSession
    prev = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", prev)


def audit(name: str, df, expect_pushdown: bool = False) -> None:
    txt = plan_text(df)
    # the formatted output repeats operators in the details section;
    # count only the tree (everything before the first detail header)
    tree = txt.split("\n\n")[0]
    checks = {
        "codegen": bool(re.search(r"codegen id", txt)),
        "bhj": len(re.findall(r"BroadcastHashJoin", tree)),
        "smj": len(re.findall(r"SortMergeJoin", tree)),
        "exchanges": len(re.findall(r"\bExchange", tree)),
        "scans": len(re.findall(r"Scan parquet", tree)),
    }
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", txt)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", txt)
    flags = []
    if expect_pushdown and not any(p.strip() for p in pushed):
        flags.append("NO-PUSHDOWN")
    if not checks["codegen"]:
        flags.append("NO-CODEGEN")
    print(
        f"{name:30s} scans={checks['scans']} bhj={checks['bhj']} "
        f"smj={checks['smj']} exch={checks['exchanges']} "
        f"codegen={'y' if checks['codegen'] else 'N'} "
        + ("  " + " ".join(flags) if flags else "")
    )
    for s in schemas:
        cols = [c.split(":")[0] for c in s.split(",") if ":" in c]
        print(f"    read: {','.join(cols)}")
    for p in pushed:
        if p.strip():
            print(f"    pushed: {p}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    lineitem = datasets.load_table(spark, sf_dir, "lineitem")

    # projection + filter must both reach the scan
    audit(
        "filter+project scan",
        lineitem.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity"),
        expect_pushdown=True,
    )

    # q1: pruned scan + partial aggregation
    from graphdb_testing_spark import (  # noqa: F401  (register queries)
        queries_analytics,
        queries_graphops,
        queries_pipeline,
        queries_relational,
        queries_temporal,
    )
    from graphdb_testing_spark.queries import all_queries

    qs = all_queries()
    audit("q1_pricing_summary", qs["q1_pricing_summary"](spark, sf_dir))
    audit("revenue_by_nation", qs["revenue_by_nation"](spark, sf_dir))
    audit("events_hourly", qs["events_hourly"](spark, sf_dir))
    audit("text_stats", qs["text_stats"](spark, sf_dir))
    audit("minhash_lsh_candidates", qs["minhash_lsh_candidates"](spark, sf_dir))
    audit("ann_cosine_topk", qs["ann_cosine_topk"](spark, sf_dir))
    audit("ivf_ann_topk", qs["ivf_ann_topk"](spark, sf_dir))
    audit(
        "customers_without_orders",
        qs["customers_without_orders"](spark, sf_dir),
        expect_pushdown=True,
    )
    audit(
        "returned_orders_by_priority",
        qs["returned_orders_by_priority"](spark, sf_dir),
        expect_pushdown=True,
    )
    audit("daily_revenue_running", qs["daily_revenue_running"](spark, sf_dir))
    audit("event_value_quantiles", qs["event_value_quantiles"](spark, sf_dir))
    from graphdb_testing_spark import queries_curation  # noqa: F401 (registers)

    qs = all_queries()
    audit("decontamination", qs["decontamination"](spark, sf_dir))

    # round-2 continuation additions (heaviest / most join-shaped)
    from graphdb_testing_spark import queries_sketches  # noqa: F401 (registers)

    qs = all_queries()
    for name in (
        "hll_distinct_users",
        "boilerplate_stats",
        "butterfly_count",
        "temporal_2paths",
        "pq_codes",
        "pq_adc_topk",
        "frequent_type_pairs",
        "histogram_quantiles",
        "bloom_prune_stats",
        "user_state_history",
        "hourly_anomalies",
        "prequential_anomalies",
        "first_touch_attribution",
        "session_window_rollup",
        "sliding_window_counts",
        "fuzzy_name_pairs",
        "kmeans_update",
        "value_trends",
        "fof_recommendations",
        "audience_overlap",
    ):
        audit(name, qs[name](spark, sf_dir))
    audit("stratified_sample", qs["stratified_sample"](spark, sf_dir))
    audit("document_chunks", qs["document_chunks"](spark, sf_dir))
    audit("curation_decision", qs["curation_decision"](spark, sf_dir))
    audit("adamic_adar_linkpred", qs["adamic_adar_linkpred"](spark, sf_dir))
    audit("event_debounce", qs["event_debounce"](spark, sf_dir))
    audit("cohort_retention", qs["cohort_retention"](spark, sf_dir))
    audit("jaccard_prefix_join", qs["jaccard_prefix_join"](spark, sf_dir))
    audit("random_walks", qs["random_walks"](spark, sf_dir))
    audit("negative_samples", qs["negative_samples"](spark, sf_dir))
    audit("sequence_packing", qs["sequence_packing"](spark, sf_dir))
    audit("json_props_stats", qs["json_props_stats"](spark, sf_dir))
    audit("corpus_prep_pipeline", qs["corpus_prep_pipeline"](spark, sf_dir))

    # TPC-H additions + embedding covariance (this session)
    audit(
        "q5_local_supplier_volume",
        qs["q5_local_supplier_volume"](spark, sf_dir),
        expect_pushdown=True,
    )
    audit(
        "q6_forecast_revenue",
        qs["q6_forecast_revenue"](spark, sf_dir),
        expect_pushdown=True,
    )
    audit(
        "q19_discounted_revenue",
        qs["q19_discounted_revenue"](spark, sf_dir),
        expect_pushdown=True,
    )
    audit("q22_global_sales_opportunity", qs["q22_global_sales_opportunity"](spark, sf_dir))
    audit("embedding_covariance_topk", qs["embedding_covariance_topk"](spark, sf_dir))
    audit("kmeans_lloyd_3round", qs["kmeans_lloyd_3round"](spark, sf_dir))
    audit("cms_heavy_hitters", qs["cms_heavy_hitters"](spark, sf_dir))
    audit("entity_groups", qs["entity_groups"](spark, sf_dir))
    audit("fingerprint_overlap_pairs", qs["fingerprint_overlap_pairs"](spark, sf_dir))
    audit("kmv_distinct_users", qs["kmv_distinct_users"](spark, sf_dir))
    audit("ewma_user_values", qs["ewma_user_values"](spark, sf_dir))

    # one iterative-kernel round body: edges join state should be a
    # broadcast hash join with no edge-side exchange
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    from graphdb_testing_spark.operators.util import state_hint

    deg = g.edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    nv = deg.count()
    state = deg.select("id", (F.lit(1.0 / nv) / F.col("degree")).alias("prd"))
    state = state.localCheckpoint()
    round_df = (
        g.edges.join(state_hint(state, nv), g.edges.dst == state.id)
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("prd").alias("mass"))
    )
    audit("pagerank round body", round_df)
    g.unpersist()


if __name__ == "__main__":
    main()
