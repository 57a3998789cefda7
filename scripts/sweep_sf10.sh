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
ONLY=$ONLY,llm_quality_percentile,llm_bpe_merges,llm_prefix_join,llm_hard_negatives
ONLY=$ONLY,llm_substring_dedup

echo "== bench at sf10 (reps=3)"
SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY="$ONLY" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' || true

echo "== done: BENCH_sf10.json"
