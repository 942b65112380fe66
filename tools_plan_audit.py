#!/usr/bin/env python
"""Generate PLANS.md: physical-plan audit of every benchmark headline
query — join strategies, exchange counts, pushed filters, codegen spans.
Run: python tools_plan_audit.py  (writes PLANS.md at the repo root)."""

from __future__ import annotations

from metadata_etl_framework_spark.session import get_spark

import __spark_entry__ as entry_mod
from bench import HEADLINE

SF_DIR = "/root/testdata/sf0.001"


def audit(name: str, df) -> dict:
    # single source of truth: the user-facing plan auditor
    from metadata_etl_framework_spark.utils.plan_audit import audit_plan

    r = audit_plan(df)
    return {
        "name": name,
        "exchanges": r["exchanges"],
        "bhj": r["broadcast_hash_joins"],
        "smj": r["sort_merge_joins"],
        "cartesian": r["cartesian"],
        "pushed": r["pushed_filters"],
        "takeordered": r["takeordered"],
    }


def _dangling_10iter(spark):
    """Regression guard for the truncated dangling-PageRank arm: at 10
    iterations the arm's 2-refs-per-round plan would unroll to ~1055
    exchanges WITHOUT lineage truncation; the ≥3-iteration
    localCheckpoint gate (round 13: cadence capped at 3, truncation at
    every materialization — same-session A/B showed checkpoint on par
    with persist, 3.37 s vs 3.55 s at sf0.1) must keep the audited
    final plan O(1) — this row pins that shape."""
    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.ops.graph import pagerank
    from metadata_etl_framework_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pair = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = pair.select(c.alias("src"), s.alias("dst"), F.col("n"))
    return pagerank(
        edges, iterations=10, damping=0.85, weight_col="n",
        checkpoint_every=3, redistribute_dangling=True,
    )


# Appendix whitelists (r12 verdict task 4): every flagged non-headline
# key needs a reason here or the audit reports it unexplained. The
# reasons name the same constant-size build-side patterns the headline
# whitelist documents — most extras are granular variants of
# whitelisted headliners (anomaly_suite's components, drift_suite's
# per-statistic arms, the global-quantile target-rank probe).
_R_STATS_1ROW = (
    "1-row broadcast stats/totals frame (two-pass statistic pattern — "
    "the anomaly_suite/drift_suite build side)"
)
_R_EDGES = (
    "1-row/edge-grid broadcast (pooled bin edges + side totals — the "
    "binned drift/histogram pattern)"
)
_R_QTARGET = (
    "bounded broadcast of the quantile-target-rank frame resolved "
    "against the prefix scan (profile_global_quantiles pattern)"
)
_R_GRID = (
    "bounded constant-size grid fan-out (threshold/lag/period/fold "
    "grid — build side fixed by the query, not the data)"
)
EXTRA_BROADCAST_CROSS: dict[str, str] = {
    # anomaly_suite components (headline whitelist: anomaly_suite)
    "anomaly_zscore": _R_STATS_1ROW,
    "anomaly_iqr": _R_QTARGET,
    "anomaly_robust_zscore": _R_QTARGET,
    "anomaly_ensemble": _R_STATS_1ROW,
    # drift per-statistic arms (headline whitelist: drift_suite)
    "drift_chi2_returnflag": _R_STATS_1ROW,
    "drift_ks_quantity": _R_STATS_1ROW,
    "drift_ks_significance": _R_STATS_1ROW,
    "drift_psi_by_flag": _R_EDGES,
    "drift_psi_by_week": _R_EDGES,
    "drift_psi_categorical": _R_STATS_1ROW,
    "drift_psi_price": _R_EDGES,
    # global-quantile target-rank probes
    "bucketize_ntile_price": _R_QTARGET,
    "customer_rfm_segments": _R_QTARGET,
    "dist_weighted_median": _R_QTARGET,
    "winsorize_prices": _R_QTARGET,
    "sketch_quantiles_lineitem": _R_QTARGET,
    "histogram_price": _R_EDGES,
    "dist_histogram2d": _R_EDGES,
    # corpus/text normalizer totals (headline: corpus_dsir_weights)
    "corpus_kl_by_source": _R_STATS_1ROW,
    "corpus_mixing_plan": _R_STATS_1ROW,
    "corpus_release_report": _R_STATS_1ROW,
    "corpus_source_entropy": _R_STATS_1ROW,
    "corpus_summary": _R_STATS_1ROW,
    "corpus_temperature_mix": _R_STATS_1ROW,
    "corpus_embed_decontaminate": (
        "broadcast of the bounded eval/query embedding set onto the "
        "corpus (the embed_knn_join pattern; eval sets are small by "
        "construction — LSH/IVF is the documented large-query path)"
    ),
    "text_bigram_logprob": _R_STATS_1ROW,
    "text_unigram_logprob": _R_STATS_1ROW,
    "text_heaps_growth": _R_GRID,
    "text_bm25_join": (
        "1-row broadcast corpus-stats frame (n/avgdl) — the "
        "eval_retrieval_bm25 headline pattern"
    ),
    "text_bm25_search": (
        "1-row broadcast corpus-stats frame + bounded query-term set "
        "— the eval_retrieval_bm25 headline pattern"
    ),
    # distribution/quality statistics over 1-row totals
    "dist_gini_totalprice": _R_STATS_1ROW,
    "dq_benford_totalprice": _R_STATS_1ROW,
    "skew_report_partkey": _R_STATS_1ROW,
    # evaluation-grid fan-outs (headline: eval_threshold_sweep/qini)
    "eval_conformal_orders": _R_STATS_1ROW,
    "eval_lift_orders": _R_QTARGET,
    "eval_qini_coefficient_orders": _R_QTARGET,
    "eval_stratified_ate_orders": _R_STATS_1ROW,
    "eval_suite_orders": _R_STATS_1ROW,
    # events/time-series grids and 1-row means
    "events_acf_hourly": _R_GRID,
    "events_changepoint": _R_STATS_1ROW,
    "events_kaplan_meier": _R_STATS_1ROW,
    "events_nelson_aalen": _R_STATS_1ROW,
    "events_seasonal_anomaly": _R_STATS_1ROW,
    "events_seasonal_dow": _R_STATS_1ROW,
    "events_stickiness": _R_STATS_1ROW,
    "feat_woe_iv_orders": _R_STATS_1ROW,
    "incr_late_split": (
        "1-row broadcast max-watermark frame splitting on-time vs "
        "late (two-pass statistic pattern)"
    ),
    "nb_top_terms_lang": (
        "|labels|-row broadcast prior/defaults grid — the nb_lang_docs "
        "headline pattern"
    ),
    "stats_fdr_ks_lineitem": _R_GRID,
    "stats_padjust_ks_lineitem": _R_GRID,
    "recsys_als_recs": (
        "DELIBERATE user × item broadcast cross for ALS top-N scoring "
        "— the item-factor build side is catalog-bounded and gated on "
        "a MEASURED count (≤ max_items, raise points at the ANN path "
        "for larger catalogs; ops/recsys.py::als_recommend)"
    ),
    # round-13 continuation sweep
    "graph_assortativity_parts": _R_STATS_1ROW,
    "graph_modularity_brands": _R_STATS_1ROW,
    "privacy_t_closeness_customer": (
        "1-row broadcast global-total frame plus the bounded "
        "sensitive-band grid crossed onto the class list (the ordered-"
        "EMD grid is gated at max_values; quality/privacy.py::"
        "t_closeness_classes)"
    ),
    "eval_aipw_ate_orders": (
        "n_strata-row broadcast stratum-means frame joined back onto "
        "the rows plus the 1-row strata-total readout cross (the "
        "eval_stratified_ate pattern; ops/evaluation.py::aipw_ate)"
    ),
    "recsys_pop_recs": (
        "DELIBERATE user × catalog broadcast cross, catalog gated on "
        "a MEASURED count (≤ max_catalog; ops/recsys.py::"
        "popularity_recommend)"
    ),
    "recsys_eval_coverage": (
        "popularity-baseline cross (measured catalog gate) plus 1-row "
        "audit-totals readout crosses (two-pass statistic pattern)"
    ),
    "events_rmst": (
        "1-row broadcast corpus-end/total frames inside the wrapped "
        "Kaplan-Meier machinery (the events_kaplan_meier pattern)"
    ),
}

BOUNDED_PARTITIONLESS_WINDOW: dict[str, str] = {
    # calendar/day grids — the window input is distinct DAYS/periods
    "drift_psi_by_week": "weeks grid (calendar-bounded)",
    "events_cumulative_users": "days grid (calendar-bounded)",
    "events_kaplan_meier": "distinct lifetime-days grid "
    "(calendar-bounded, documented in the op)",
    "events_nelson_aalen": "distinct lifetime-days grid "
    "(calendar-bounded)",
    "funnel_windowed": "stage×window grid (bounded by config)",
    "corpus_epoch_plan": "epoch grid (bounded by config)",
    "corpus_mixing_plan": "per-source grid (|sources| rows)",
    # p-value / threshold grids
    "stats_fdr_ks_lineitem": "4-row p-value grid",
    "stats_padjust_ks_lineitem": "4-row p-value grid",
    "eval_lift_orders": "decile grid (NTILE over the bounded "
    "score-bucket frame)",
    "eval_qini_coefficient_orders": "decile grid",
    # sketch-sized frames
    "sketch_kmv_orders": "k-row KMV sketch (k = 256 by construction)",
    "sketch_quantiles_lineitem": "n_bins-row histogram CDF",
    "eval_conformal_orders": "calibration-frame rank selection — the "
    "op documents the keyless window and callers bound the "
    "calibration split (sampled at scale)",
    "recsys_eval_coverage": "catalog-bounded Gini rank window "
    "(distinct items; the op documents the bound)",
    "events_rmst": "distinct-lifetime-days grid (calendar-bounded, "
    "the events_kaplan_meier pattern)",
}


def main() -> None:
    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    queries = {**entry_mod.queries(), **entry_mod.extra_queries()}
    rows = []
    for name in HEADLINE:
        rows.append(audit(name, queries[name](spark, SF_DIR)))
    # non-headline regression guard: the truncated dangling arm
    d10 = audit("graph_pagerank_dangling_10iter_truncated",
                _dangling_10iter(spark))
    assert d10["exchanges"] <= 8, (
        f"truncated dangling arm regressed to "
        f"{d10['exchanges']} exchanges — lineage truncation "
        f"(ops/graph.py redistribute_dangling gate) broke"
    )
    rows.append(d10)

    lines = [
        "# PLANS — physical-plan audit of the benchmark headline set",
        "",
        "Generated by `python tools_plan_audit.py` (sf0.001 input; plan",
        "SHAPE is scale-independent). Properties the 100-TB design rests",
        "on: zero cartesian/broadcast-nested-loop joins anywhere, filters",
        "pushed to the parquet scans, top-k via TakeOrderedAndProject,",
        "broadcast-hash joins for dimensions.",
        "",
        "| query | exchanges | broadcast HJ | sort-merge J | cartesian/BNLJ"
        " | scans w/ pushed filters | top-k no-sort |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['bhj']} | {r['smj']} | "
            f"{r['cartesian']} | {r['pushed']} | "
            f"{'✓' if r['takeordered'] else '—'} |"
        )
    # Deliberate tiny-side broadcast crosses (scalar-stats frames, small
    # query sets) — constant-size build sides, not scale hazards:
    known_broadcast_cross = {
        "anomaly_suite": "1-row broadcast stats frame (mean/std/IQR bounds)",
        "embed_knn_join": "broadcast query set (3 rows; doc: switch to "
        "LSH/IVF for large query sets)",
        "corpus_dsir_weights": "1-row broadcast n-gram grand totals "
        "(target/raw normalizers)",
        "drift_suite": "1-row broadcast bin edges / side totals "
        "(two-pass statistic pattern, same family as anomaly_suite)",
        "events_rolling_active_users": "1-row broadcast max-observed-day "
        "frame clipping phantom tail windows",
        "drift_emd_quantity": "1-row broadcast side-totals frame "
        "(two-pass statistic pattern)",
        "drift_ks_binned": "1-row broadcast pooled-edges + side-totals "
        "frames (binned two-pass statistic)",
        "drift_emd_binned": "1-row broadcast pooled-edges + side-totals "
        "frames (binned two-pass statistic)",
        "profile_global_quantiles": "broadcast of the <=10-row "
        "quantile-target-rank frame resolved against the prefix scan",
        "drift_suite_forced_binned": "C-row broadcast per-column "
        "edge frame + per-column totals onto the fused melt (round-12 "
        "fusion: ONE stacked pass and ONE (column, psi_bin, ks_bin) "
        "groupBy for ALL binned columns — "
        "quality/drift.py::_drift_numeric_binned)",
        "eval_threshold_sweep_orders": "1-row broadcast totals frame "
        "(__tot_n/__tot_p) crossed onto the distinct-score sweep — the "
        "pr_auc/binary_auc two-pass statistic pattern",
        "graph_pagerank_dangling": "per-iteration 1-row broadcast "
        "dangling-mass aggregate re-entering the rank update "
        "(ops/graph.py redistribute_dangling arm); round 13: the arm "
        "lineage-truncates from 3 iterations with materialization "
        "cadence capped at 3 (rank referenced 2x per round doubles "
        "the un-truncated plan — the r12 benched entry analyzed to "
        "1055 exchanges), so the benched row and the "
        "*_10iter_truncated row below both read a checkpoint leaf",
        "graph_pagerank_dangling_10iter_truncated": "same 1-row "
        "dangling-mass broadcast; final plan reads the last "
        "localCheckpoint, so exchanges stay O(1) regardless of "
        "iteration count (asserted <= 8 by the audit)",
        "eval_retrieval_bm25": "1-row broadcast corpus-stats frame "
        "inside bm25_join (n/avgdl) plus the ENTRY's synthetic qrels "
        "built as a 3-row query-id broadcast cross onto a document "
        "slice — real deployments read judgments as a table; "
        "retrieval_metrics itself joins only on (query, doc)",
        "eval_bleu_docs": "1-row broadcast lengths x ln-precision "
        "frames joined for the BP/geometric-mean roll-up (two-pass "
        "statistic pattern; the gram clip join itself is an equi-join)",
        "feat_target_encoding_orders": "1-row broadcast grand-totals "
        "frame crossed onto the <=n_folds-row per-fold grid to form "
        "the out-of-fold priors (ops/features.py::target_encoding_table)",
        "embed_drift_snapshots": "1-row broadcast reference-centroid "
        "norm crossed onto the per-row cosine frames, plus the 1-row "
        "centroid-alignment aggregate (two-pass statistic pattern; "
        "the GEMV itself equi-joins on the dim index)",
        "eval_chrf_docs": "1-row broadcast pair-count x per-order "
        "macro-average frames joined for the F_beta roll-up (the BLEU "
        "two-pass pattern; the char-gram clip join is an equi-join)",
        "eval_qini_orders": "ntile_assign's 1-row broadcast "
        "total-rows frame resolved against the global rank (the "
        "profile_global_quantiles pattern)",
        "text_scaling_laws": "1-row broadcast max-doc-id frame fanned "
        "into the 10-row threshold grid, plus the two 1-row OLS-sum "
        "frames and totals joined for the single-row output",
        "events_periodogram": "1-row broadcast mean/denominator frames "
        "onto the calendar-bounded bucket grid, plus the 47-row period "
        "grid fan-out (the spectral workload's intended shape)",
        "stats_bootstrap_ci_price": "bounded 100-row broadcast "
        "replicate fan-out (the Poisson-bootstrap row multiplier — "
        "constant-size build side, map-side collapsed to n_boot rows "
        "per task) plus the 1-row point-estimate x CI readout join",
        "drift_cvm_quantity": "1-row broadcast side-totals frame onto "
        "the dual prefix scan (the ks_statistic two-pass pattern; the "
        "scan itself is the range-partitioned equi-merge)",
        "events_seasonal_decompose": "1-row broadcast grand-mean frame "
        "onto the <=period-row seasonal grid (re-centering Σs=0), plus "
        "the broadcast phase join back — calendar-bounded frames",
        "embed_silhouette_labels": "L-row broadcast centroid-array "
        "frame crossed onto the corpus for the O(n·L) simplified-"
        "silhouette projection — constant-size build side (L = number "
        "of clusters), the scale-safe replacement for O(n²) pairwise",
        "embed_kmeans_summary": "k-row broadcast centroid frame crossed "
        "onto the corpus for the Lloyd assignment projection — n·k·d "
        "scoring work with a constant-size build side, the intended "
        "k-means shape (ops/clustering.py; k bounded small)",
        "nb_lang_docs": "|labels|-row broadcast prior/default frames "
        "crossed onto the doc-token stream (the NB scoring fan-out — "
        "constant-size build side) plus the 1-row doc-count total "
        "under the priors (ops/classify.py)",
        "stats_bootstrap_diff_price": "bounded 100-row broadcast "
        "replicate fan-out (the Poisson-bootstrap row multiplier) "
        "plus the 1-row point-estimate x CI readout join — the "
        "stats_bootstrap_ci_price pattern on two arms",
        "events_ljung_box": "1-row broadcast series-mean/denominator/"
        "bucket-count frames onto the bounded ACF lag grid (acf_table's "
        "two-pass statistic pattern; the lag self-join is a band "
        "equi-join on the bucket index)",
        "sketch_kll_rollup_price": "5-row broadcast probability-probe "
        "frame crossed onto the 1-row total, and the ≤ k-row "
        "target-rank frame broadcast onto the per-group distinct-value "
        "CDF (the profile_global_quantiles pattern) — every build "
        "side is sketch-/probe-sized by construction",
        "sketch_kll_rollup_events": "same sketch-sized build sides as "
        "sketch_kll_rollup_price on the hourly-bucket rollup: the "
        "≤ k-row merged-sketch CDF and probe-rank frames broadcast "
        "onto each other (profile_global_quantiles pattern)",
        "eval_aipw_ate_orders": "n_strata-row broadcast stratum-means "
        "frame joined back onto the rows plus the 1-row strata-total "
        "readout cross (the eval_stratified_ate pattern)",
        "graph_assortativity_parts": "1-row broadcast node/edge-count "
        "readout frames onto the 1-row moment aggregate (two-pass "
        "statistic pattern)",
        "graph_modularity_brands": "1-row broadcast total-edge-count "
        "frame onto the per-community rollup (two-pass statistic "
        "pattern)",
        "privacy_t_closeness_customer": "1-row global-total + bounded "
        "band-grid crosses (ordered-EMD grid gated at max_values)",
        "recsys_pop_recs": "DELIBERATE user × catalog broadcast cross "
        "for the popularity baseline — catalog gated on a MEASURED "
        "count (≤ max_catalog; ops/recsys.py::popularity_recommend)",
        "recsys_eval_coverage": "popularity-baseline cross (measured "
        "catalog gate) plus 1-row audit-totals readout crosses "
        "(two-pass statistic pattern)",
        "events_rmst": "1-row horizon/observation-end readout crosses "
        "plus the KM survival-grid cross — the grid is bounded by "
        "horizon_days by construction (ops/retention.py::rmst), so "
        "every build side is ≤ horizon-sized; the partitionless "
        "Window.orderBy runs on that same bounded grid",
        "graph_pmi_knn": "broadcast bounded query set (node < 10 — "
        "the embed_knn_join pattern) crossed onto the node-embedding "
        "corpus for exact brute-force cosine; the documented large-"
        "query path is the LSH-bucketed join "
        "(ops/similarity.py::knn_join_topk gate)",
    }
    bad = [
        r["name"]
        for r in rows
        if r["cartesian"] and r["name"] not in known_broadcast_cross
    ]
    lines += ["", f"Unexplained cartesian/BNLJ present in: {bad or 'NONE'}", ""]
    expected = [
        f"- `{n}`: {why}" for n, why in known_broadcast_cross.items()
        if any(r["name"] == n and r["cartesian"] for r in rows)
    ]
    if expected:
        lines += [
            "Expected broadcast-cross joins (constant-size build side, by design):",
            *expected,
            "",
        ]

    # ---- appendix (r12 verdict task 4): hazard scan of EVERY oracle
    # key, not just the bench headliners — a silent scale-killer in an
    # extras-only key must not be invisible. Cheap counters only
    # (cartesian/BNLJ, pushdown, partitionless windows).
    from metadata_etl_framework_spark.utils.plan_audit import audit_plan

    headline_set = set(HEADLINE)
    appendix = []
    errors = []
    for name, fn in sorted(queries.items()):
        if name in headline_set:
            continue
        try:
            r = audit_plan(fn(spark, SF_DIR))
        except Exception as e:  # pragma: no cover - diagnostic path
            errors.append((name, str(e)[:160]))
            continue
        appendix.append(
            {
                "name": name,
                "exchanges": r["exchanges"],
                "cartesian": r["cartesian"],
                "pushed": r["pushed_filters"],
                "pwin": r["has_partitionless_window"],
            }
        )
    bad_extra = [
        a["name"]
        for a in appendix
        if a["cartesian"] and a["name"] not in known_broadcast_cross
        and a["name"] not in EXTRA_BROADCAST_CROSS
    ]
    # partitionless windows are a hazard UNLESS the frame is bounded
    # by construction (sketch-/grid-sized inputs)
    bad_pwin = [
        a["name"]
        for a in appendix
        if a["pwin"] and a["name"] not in BOUNDED_PARTITIONLESS_WINDOW
    ]
    n_clean = sum(
        1 for a in appendix if not a["cartesian"] and not a["pwin"]
    )
    lines += [
        "## Appendix — hazard scan of every oracle key",
        "",
        f"{len(appendix)} non-headline keys scanned at sf0.001 "
        f"(+{len(rows)} headline rows above = full oracle surface); "
        f"{n_clean} are cartesian-free with no partitionless window.",
        "",
        f"Unexplained cartesian/BNLJ (all keys): {bad_extra or 'NONE'}",
        f"Unexplained partitionless windows: {bad_pwin or 'NONE'}",
        f"Keys that failed to build: {errors or 'NONE'}",
        "",
        "| key | exchanges | cartesian/BNLJ | pushed scans | "
        "partitionless window |",
        "|---|---|---|---|---|",
    ]
    for a in appendix:
        flag = a["cartesian"] or a["pwin"]
        if not flag:
            continue  # table lists only keys needing an explanation
        lines.append(
            f"| {a['name']} | {a['exchanges']} | {a['cartesian']} | "
            f"{a['pushed']} | {'yes' if a['pwin'] else '—'} |"
        )
    lines += [
        "",
        "(Hazard-free keys are counted above but omitted from the "
        "table; explanations for every flagged key live in the "
        "whitelists inside tools_plan_audit.py.)",
        "",
    ]
    with open("PLANS.md", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(
        f"wrote PLANS.md ({len(rows)} headline + {len(appendix)} "
        f"appendix keys; unexplained cartesian: {bad + bad_extra or 'none'}; "
        f"unexplained pwin: {bad_pwin or 'none'}; errors: {len(errors)})"
    )


if __name__ == "__main__":
    main()
