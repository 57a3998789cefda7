#!/bin/bash
# Per-round sf1 scale sweep: regenerate the deterministic sf1 corpus (seed
# 777, hot key), run the full Verify dump + correctness compare with the
# linear-replay oracles (NO skipped rows), and refresh BENCH_sf1.json.
# Artifacts: CORRECTNESS_sf1_r${ROUND}.json + BENCH_sf1.json in the repo root.
# Usage: scripts/sweep_sf1.sh <round-number>
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: sweep_sf1.sh <round-number>}"
SF1=target/testdata/sf1

if [ ! -f "$SF1/.complete" ]; then
  echo "== generating sf1 testdata (seed 777)"
  python3 scripts/gen_sf.py --sf 1 --seed 777 --out "$SF1"
  touch "$SF1/.complete"
fi

echo "== Verify dump at sf1"
# per-SF staging root: the s5/h1_derived oracles read staged files whose
# absolute path is embedded in oracle_sql.json — a Verify run at ANOTHER SF
# sharing the default root would overwrite them and break later replays
export SPARK_GRAFT_STAGE_DIR="$PWD/target/stage_sf1"
sbt -batch "runMain graft.Verify $SF1 target/verify_sf1" 2>/dev/null | grep -i "\[verify\]" || true

echo "== correctness compare (linear-replay oracles, full coverage)"
python3 scripts/check_correctness.py "$SF1" target/verify_sf1 \
  --linear-replay --json "CORRECTNESS_sf1_r${ROUND}.json" || true

echo "== bench at sf1 (headline + the stream-static-join LM scorer)"
# stream_bigram_lm_join rides the sf1 record so the 100 TB stream-scoring
# wiring carries a measured scale number, not just a shape argument (r15
# verdict item 7)
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  SPARK_GRAFT_BENCH_EXTRA=stream_bigram_lm_join \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' || true

echo "== done: CORRECTNESS_sf1_r${ROUND}.json + BENCH_sf1.json"
