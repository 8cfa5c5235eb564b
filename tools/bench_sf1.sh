#!/usr/bin/env bash
# Driver-visible sf1 bench tier (VERDICT r15 item 3): the operative
# <=2x-DuckDB gate lives at sf1+ (BASELINE.md section c), but the driver
# benches sf0.1 only — this script makes the at-scale tier reproducible
# from one command:
#   1. builds the deterministic sf1 fixture (graft.ScaleUp, x10 of
#      /root/testdata/sf0.1) if absent,
#   2. runs the full-corpus bench against it (same graft.Bench, same
#      one-line JSON contract; the keyed detail board survives as
#      BENCH_DETAIL_sf1_c<cpus>.json),
#   3. runs the DuckDB side over the heavy-tail subset for the ratio
#      table (tools/duck_subset_bench.py — warm views, 32 threads,
#      min-of-3; needs an oracle_sql.json from any graft.Verify run).
#
# Usage: tools/bench_sf1.sh  [env: SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS,
#                             SPARK_GRAFT_SF1_DIR, SPARK_GRAFT_ORACLE]
set -uo pipefail
cd "$(dirname "$0")/.."

SF1_DIR="${SPARK_GRAFT_SF1_DIR:-$PWD/target/sf1}"
ORACLE="${SPARK_GRAFT_ORACLE:-$PWD/target/verify_sf001/oracle_sql.json}"

if [ ! -e "$SF1_DIR/lineitem.parquet" ]; then
  echo "[bench_sf1] building sf1 fixture at $SF1_DIR" >&2
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $SF1_DIR 10" >&2 || exit 1
fi

# the bench's one-line JSON goes to stdout (unprefixed: build.sbt sets
# outputStrategy := StdoutOutput); sbt chatter is interleaved but the
# wire line is the LAST stdout line
SPARK_GRAFT_SF_DIR="$SF1_DIR" sbt -batch "runMain graft.Bench"
rc=$?

# DuckDB comparison subset: every query the at-scale table tracks
if [ -f "$ORACLE" ] && command -v python3 >/dev/null 2>&1; then
  python3 tools/duck_subset_bench.py "$SF1_DIR" "$ORACLE" \
    q_dedup_jaccard_prefix q_dedup_minhash_lsh q_dedup_jaccard \
    q_pipeline_clean_corpus q_pipeline_boilerplate q_pipeline_dup_clusters \
    q_text_char_entropy q_text_unigram_lm q_agg_percentile \
    q_tpch_q5 q_tpch_q18 q_tpch_q21 >&2 || true
else
  echo "[bench_sf1] no oracle_sql.json at $ORACLE - skipping DuckDB side" >&2
fi
exit $rc
