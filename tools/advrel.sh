#!/bin/bash
# Adversarial RELATIONAL rung (r15): regenerate the hostile + empty-facts
# table sets and run the ~49-query relational/temporal gate subset
# against both, DuckDB-oracle-compared like the main gate.
# Usage: tools/advrel.sh
# Expect: hostile == 49 pass, 0 fail; empty == 48 pass + agg_cube as the
# single DECLARED divergence (Spark grouping-sets over EMPTY input emit
# no global row where the SQL standard and DuckDB emit one — Spark-core
# Expand behavior, documented in SCALING r15).
set -e
cd /root/repo
REL="q1_agg q6_filter_agg q3_topn q5_multijoin join_semi join_anti join_outer \
window_rank window_running window_ntile agg_rollup agg_cube agg_distinct \
agg_percentile agg_histogram agg_approx pivot_wide unpivot_long union_dedup \
topk_group asof_join range_join sessionize json_extract skew_join \
window_sliding_distinct funnel retention_cohort resample_ffill q4_exists \
q17_scalar q18_bigcust q19_disjunct q21_late_supplier q22_idle_rich \
agg_grouping_sets window_range_frame q2_min_cost_supp q7_volume \
q8_market_share q9_profit q10_returns q11_share_threshold q13_order_dist \
q14_promo_share q15_top_supplier q16_supplier_count q20_qty_surplus q12_shipmode"
export SPARK_GRAFT_VERIFY_QUERIES=$(echo $REL | tr ' ' ',')
tools/runmain.sh graft.R15AdversarialRelGen /root/repo/testdata-advrel 2>/dev/null | tail -1
tools/runmain.sh graft.R15AdversarialRelGen /root/repo/testdata-advrel-empty empty 2>/dev/null | tail -1
echo "== hostile rung =="
SPARK_GRAFT_CPUS=8 tools/runmain.sh graft.Verify /root/repo/testdata-advrel /tmp/advrel_out \
  2>&1 | grep -E "\[verify\].*failed" || true
python3 tools/compare.py /root/repo/testdata-advrel /tmp/advrel_out $REL | grep -E "^FAIL|== "
echo "== empty-facts rung (agg_cube is the declared divergence) =="
SPARK_GRAFT_CPUS=8 tools/runmain.sh graft.Verify /root/repo/testdata-advrel-empty /tmp/advrel_empty_out \
  2>&1 | grep -E "\[verify\].*failed" || true
python3 tools/compare.py /root/repo/testdata-advrel-empty /tmp/advrel_empty_out $REL | grep -E "^FAIL|== "
