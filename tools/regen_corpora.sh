#!/usr/bin/env bash
# Regenerate every scaled probe corpus from the repo alone (r13 verdict
# ask #6: the probe artifacts were honest but unreproducible — the /tmp
# corpora are ephemeral). All generators are DETERMINISTIC functions of
# the driver testdata: key-shifted union growth with fixed per-copy
# tags/offsets (no RNG — see ScaleProbe's scaladoc for the growth-model
# rationale), so a fresh machine rebuilds byte-identical inputs.
#
#   10x  (sf1 scale)   /tmp/graft_scale10x    ScaleProbe (default factor 10)
#   100x (sf10 scale)  /tmp/graft_scale100x   ScaleProbe with
#                        SPARK_GRAFT_SCALE_DIR=/tmp/graft_scale100x
#                        SPARK_GRAFT_SCALE_FACTOR=100
#   skew (hot-key)     /tmp/graft_skew10x     SkewProbe (hot-user corpus,
#                        sentinel _GRAFT_SKEW_OK)
#
# Each generator writes a _GRAFT_SCALE_OK / _GRAFT_SKEW_OK sentinel when
# complete and skips work if it exists — delete the sentinel (or the
# dir) to force a rebuild. Generation happens as a side effect of
# running each probe; to ONLY build a corpus without a full timing
# sweep, restrict the probe to one cheap key with 1 run as below.
set -euo pipefail
cd "$(dirname "$0")/.."
BASE=${1:-/root/testdata/sf0.1}

echo "== 10x corpus (/tmp/graft_scale10x) from $BASE =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_SCALE_KEYS=agg_groupby_q1 SPARK_GRAFT_SCALE_RUNS=1 \
  sbt -batch "runMain graft.ScaleProbe $BASE"

echo "Done. For the 100x corpus run the same command with"
echo "  SPARK_GRAFT_SCALE_DIR=/tmp/graft_scale100x SPARK_GRAFT_SCALE_FACTOR=100"
echo "and for the skew corpus run: sbt 'runMain graft.SkewProbe $BASE'"
