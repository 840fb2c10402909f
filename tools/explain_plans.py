#!/usr/bin/env python
"""Dump formatted physical plans for the headline queries and check the
plan properties that matter at 100 TB:

* parquet scans carry PushedFilters / pruned ReadSchema,
* dimension joins are BroadcastHashJoin,
* expression work sits inside WholeStageCodegen spans,
* no CartesianProduct / BroadcastNestedLoopJoin sneaks in where an
  equi-join was intended.

Writes PLANS.md at the repo root.  Run: python tools/explain_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_cpc_schema_spark import queries as Q  # noqa: E402
from etl_cpc_schema_spark.session import get_spark  # noqa: E402

INSPECT = [
    "q14_pipeline_composite",
    "q17_pricing_summary",
    "q18_join_agg",
    "q16_dedup_last_wins",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_lsh_jaccard",
    "dedup_simhash_pairs",
    "ann_lsh_topk",
    "ann_lsh_topk_probed",
    "ann_ivf_topk",
    "dedup_components",
    "q23_asof_join",
    "docs_pack_sequences",
    "docs_contamination",
    "docs_corpus_build",
    "docs_cdc_dedup",
    "text_rare_tokens",
    "text_bpe_encode",
    "docs_stratified_sample",
    "text_pii_scrub",
    "q48_resample_gapfill",
    "q49_snapshot_diff",
    "docs_global_shuffle",
    "docs_domain_mix",
    "text_bm25_topk",
    "docs_dup_spans",
    "docs_scrub_dup_spans",
    "text_keywords",
    "text_lm_perplexity",
    "text_winnowing",
    "ann_knn_join",
    "q55_funnel",
    "q56_cohort_retention",
    "q57_scd2_merge",
    "q58_shipping_priority",
    "q59_local_supplier_volume",
    "q61_returned_items",
    "q62_nation_trade_volume",
    "q63_promo_share",
    "q64_large_volume",
    "q65_custdist",
    "docs_winnow_pairs",
    # round 6: the new planner classes + pipeline operators
    "q66_avg_quantity_outliers",
    "q67_waiting_suppliers",
    "q68_sales_opportunity",
    "q69_top_supplier",
    "q70_nation_value_share",
    "text_gopher_filters",
    "docs_dsir_weights",
    "q71_disjunctive_revenue",
    "q72_market_share",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    # round 7: SemDeDup composite, Q16/Q20 planner shapes, hashed
    # quality classifier, count-min heavy hitters
    "docs_semdedup",
    "q73_supplier_part_counts",
    "q74_dominant_suppliers",
    "docs_quality_logreg",
    "approx_heavy_hitters",
    # late round-7: k-means pruning, Bloom decontamination (batch),
    # the KMV source-overlap sketch, and the native recursive CTE
    "docs_kmeans_prune",
    "docs_bloom_contamination",
    "docs_source_overlap",
    "q75_recursive_closure",
    "q78_lateral_topk",
    "docs_modern_corpus",
    "docs_ccnet_buckets",
    "docs_hard_negatives",
    "q79_sliding_window",
    "q80_bag_set_ops",
    "q81_fuzzy_join",
    "q82_triangle_counts",
    "text_textrank",
    "q83_label_propagation",
    "multimodal_dedup",
    "multimodal_dedup_clustered",
    "docs_corpus_drift",
    "docs_incremental_dedup",
    "ann_ivfpq_indexed",
    # round 9: the appended-index probe and the video frame-hash
    # composition (stream_incremental_dedup is excluded — its plan is
    # per-micro-batch inside foreachBatch, not a single DataFrame)
    "ann_ivfpq_appended",
    "multimodal_video_dedup",
    # round 10: the maintained-index probes — deleted reads base +
    # tombstone anti-joins; compacted reads the folded generation
    # (same oracle, two physical states); the dedup twin runs the
    # full save/delta-append/delete/compact lifecycle behind its
    # probe plan
    "ann_ivfpq_deleted",
    "ann_ivfpq_compacted",
    "docs_dedup_index_maintained",
    # round 10: the audio near-dup composition (codegen fingerprint
    # pass + set-overlap equi-join — the video plan's shape)
    "multimodal_audio_dedup",
    # round 10: metadata-filtered vector search — the label equality
    # must sit INSIDE the cell join's key set (extra equi-join key),
    # not as a post-scoring filter; the _ivfpq variant probes the
    # persisted index with the label as a codes payload column
    "ann_filtered_topk",
    "ann_ivfpq_filtered",
]

CHECKS = {
    "broadcast_join": "BroadcastHashJoin",
    # NB: under AQE the pre-execution formatted plan does not print
    # WholeStageCodegen spans; 'no' here only means AQE is active.
    "codegen spans printed (AQE hides pre-execution)": "WholeStageCodegen",
    "pushed_filters": "PushedFilters",
    "cartesian (should be absent)": "CartesianProduct",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain_plans", cpus=8)
    out = ["# PLANS — physical-plan review of headline queries", ""]
    out.append(f"Generated against `{sf_dir}`. Checks: broadcast joins for")
    out.append("dimension lookups, whole-stage codegen coverage, parquet")
    out.append("filter pushdown, and absence of accidental cartesian joins.")
    out.append("")
    for name in INSPECT:
        df = Q.SPARK_QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out.append(f"## {name}")
        out.append("")
        flags = []
        for label, needle in CHECKS.items():
            hit = needle in plan
            flags.append(f"- {label}: {'yes' if hit else 'no'}")
        out.extend(flags)
        out.append("")
        out.append("```")
        # keep the readable tree, drop the verbose per-node detail dump
        tree = plan.split("\n\n")[0]
        out.append(tree.strip())
        out.append("```")
        out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
