#!/bin/bash
# Fresh-JVM-per-cell targeted probe runner (VERDICT r10 §2/§3 protocol:
# idle host, one JVM per k cell, SPARK_GRAFT_PROBE_OPS targeted slice —
# stdout only, never clobbers SCALE.md).
#
#   tools/targeted_probe.sh "op1,op2" "1 2 4 8"
#
# Each cell prints `k=K op: T s rows=N`; fit alpha offline from the cells.
set -u
OPS="$1"
KS="${2:-1 2 4 8}"
for K in $KS; do
  SPARK_GRAFT_PROBE_OPS="$OPS" \
  SPARK_GRAFT_PROBE_KS="$K" \
  SPARK_GRAFT_PROBE_EXT_K=0 \
  SPARK_GRAFT_DRIVER_MEM="${SPARK_GRAFT_DRIVER_MEM:-20g}" \
  python tools/scale_probe.py 2>&1 | tr '\r' '\n' | grep -E "k=|FAILED|Rows at|warm-up" | grep -v "Stage"
done
