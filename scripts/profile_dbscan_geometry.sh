#!/bin/bash
# DBSCAN LSH geometry experiment (r15 profile follow-up): candidate distinct
# is 43% of llm_dbscan_lsh at sf10 — 123 M candidate sightings for 53 k
# ε-edges. Trade per-table bucket width (bits) against table count at equal
# ε-recall and measure which geometry minimizes bucketing + candidate cost.
#
# Equal-recall arithmetic (per-bit grazing-edge collision 0.866 at ε=0.9):
#   miss exponent ≈ tables × 0.866^bits; baseline 12×64 → 64·0.178 = 11.4
#   (miss ≈ e^-11.4 ≈ 1e-5 per grazing edge).
#   16 bits → 0.866^16 = 0.100 → 114 tables for the same exponent
#   14 bits → 0.866^14 = 0.133 →  86 tables
# More bits cut RANDOM collisions ~2x per bit (random pairs collide per bit
# at 0.5) but raise the bucketing pass ∝ bits×tables — the experiment
# measures where the product bottoms out. Verified-pair count printed by the
# tool is the recall check: it must match the baseline's edge count.
#
# Usage: scripts/profile_dbscan_geometry.sh [sfdir]   (default sf10)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-target/testdata/sf10}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# same JDK17 add-opens + heap the sbt fork uses (build.sbt) — plain java so
# the experiment doesn't fight sbt's project lock
OPTS="-Xmx${SPARK_DRIVER_MEM:-16g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
for geo in "12 64" "14 86" "16 114"; do
  read -r bits tables <<<"$geo"
  echo "== geometry ${bits}x${tables}"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_LSH_BITS="$bits" \
    SPARK_GRAFT_LSH_TABLES="$tables" \
    java $OPTS -cp "$CP" graft.tools.ProfileDbscan 2>/dev/null \
    | grep '\[profile\]'
done
