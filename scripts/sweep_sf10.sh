#!/bin/bash
# sf10 spot-bench: the heavy-query subset at 100x the driver's largest SF,
# refreshing BENCH_sf10.json. Includes the output-bound rows (j5), the
# domain pipeline, and the candidate-volume-driven prefix join, whose
# "prefix_candidate_pairs" field in the JSON is the measured selectivity
# evidence for PrefixJoin's scaling claim.
# Usage: scripts/sweep_sf10.sh
set -euo pipefail
cd "$(dirname "$0")/.."
SF10=target/testdata/sf10

if [ ! -f "$SF10/.complete" ]; then
  echo "== generating sf10 testdata (seed 777)"
  python3 scripts/gen_sf.py --sf 10 --seed 777 --out "$SF10"
  touch "$SF10/.complete"
fi

ONLY=j5_range_join,j5_hot_plain,j5_hot_salted,g1_candles_1s,w1_volume_spikes
ONLY=$ONLY,w4_bollinger,h1_indicator_pass,h1_bucketed,h2_patterns
ONLY=$ONLY,w14_anchor_points,pipeline_full,llm_minhash_dedup
ONLY=$ONLY,llm_quality_percentile,llm_bpe_merges,llm_hard_negatives
ONLY=$ONLY,llm_substring_dedup,llm_substring_trim,llm_substring_trimmed_text
ONLY=$ONLY,llm_suffix_array,llm_dbscan_lsh,w17_anomaly_mad,w17_bucketed
ONLY=$ONLY,llm_bigram_lm_filter,llm_suffix_dup_positions,llm_incremental_bucketed

echo "== bench at sf10 (reps=3, per-query external-cpu gate + 1.4x self-consistency retry)"
# Bench gates EACH query on external CPU (processes other than the bench
# JVM) and re-runs any query whose median/min exceeds 1.4x — the r15 record
# was contaminated mid-sweep on rows the round never touched, which a
# start-only load gate cannot see. The artifact carries "regated"/"noisy"
# fields naming any query that tripped either rule.
# sbt runs to a log and its exit status is checked SEPARATELY from the
# grep: piping sbt into `grep || true` masked a failed bench run, letting a
# stale BENCH_sf10.json from a previous run pass for fresh results.
LOG=target/bench_sf10.log
rm -f BENCH_sf10.json
if ! SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY="$ONLY" \
  sbt -batch "runMain graft.Bench" >"$LOG" 2>&1; then
  echo "== BENCH FAILED (sbt exit != 0); tail of $LOG:" >&2
  tail -30 "$LOG" >&2
  exit 1
fi
grep '"metric"' "$LOG" || { echo "== no metric line in $LOG" >&2; exit 1; }

# The prefix join is its own labeled artifact: at sf10 its single run is
# ~16 min (candidate-volume-bound by design), so it is benched at 1 rep
# SEPARATELY from the main record — a -1/error row in the main artifact
# cost round 13 a clean baseline.
echo "== prefix join at sf10 (reps=1, separate artifact)"
PLOG=target/bench_sf10_prefix.log
rm -f BENCH_sf10_prefix_join.json
if ! SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_BENCH_OUT=BENCH_sf10_prefix_join.json \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_ONLY=llm_prefix_join \
  sbt -batch "runMain graft.Bench" >"$PLOG" 2>&1; then
  echo "== PREFIX BENCH FAILED (sbt exit != 0); tail of $PLOG:" >&2
  tail -30 "$PLOG" >&2
  exit 1
fi
grep '"metric"' "$PLOG" || { echo "== no metric line in $PLOG" >&2; exit 1; }

echo "== done: BENCH_sf10.json + BENCH_sf10_prefix_join.json"
