#!/usr/bin/env bash
# Standing sf1 oracle sweep (r11 verdict item 7): the full-suite scaled
# sweep is the repo's primary divergence-hunting channel (q124/q133/q201
# r10; q333/q92/q366/q418 r11; it finds bugs precisely when RE-RUN after
# a widening, because new queries and old queries share helpers). This
# driver makes the sweep a one-command round-close step instead of a
# hand-assembled fanout.
#
# Usage:
#   tools/sweep.sh                 # full suite at the sf1-equivalent dir
#   tools/sweep.sh q484_x,q485_y   # subset (e.g. just this round's widening)
#
# Round-close contract (NOTES template): every widening runs
#   1. sf0.001 + sf0.01 Verify/check (the driver gate's scales);
#   2. THIS SWEEP at sf1 for at least the widened subset — full suite
#      after helper-touching changes;
# before the round is closed.
set -euo pipefail
cd "$(dirname "$0")/.."

SFX1=${GRAFT_SWEEP_DIR:-/tmp/sfx1}
OUT=${GRAFT_SWEEP_OUT:-/tmp/sweep_out}
ONLY=${1:-}

if [ ! -d "$SFX1" ]; then
  echo "[sweep] staging $SFX1 (ScaleUp k=10 of sf0.1)"
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $SFX1 10"
fi

echo "[sweep] Verify -> $OUT"
env SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  ${ONLY:+SPARK_GRAFT_ONLY=$ONLY} \
  sbt -batch "runMain graft.Verify $SFX1 $OUT"

echo "[sweep] oracle fanout (GRAFT_ORACLE_TIMEOUT=1800, GRAFT_DUCK_MEM=24GB)"
GRAFT_ORACLE_TIMEOUT=${GRAFT_ORACLE_TIMEOUT:-1800} \
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-24GB} \
  python3 tools/check.py "$SFX1" "$OUT" --fanout
