#!/usr/bin/env bash
# One-command gate runner (r8-verdict #7): the full ScalaTest battery
# plus both runtime probes — ScaleProbe (per-class growth bounds + the
# no-cartesian assert at 5x, exit 1 on violation) and SpillProbe
# (spill engages under a tight memory budget with bit-identical
# results). Each stage's exit code is printed and the script exits
# non-zero if ANY stage failed, so "bash scripts/gates.sh" is the whole
# CI-style verdict.
#
# Usage: bash scripts/gates.sh [sfDir]   (default /root/testdata/sf0.1)
set -u
SF="${1:-/root/testdata/sf0.1}"
declare -A codes

run() { # name, command...
  local name="$1"; shift
  echo "== gate: $name =="
  "$@"
  codes[$name]=$?
  echo "== gate: $name exit ${codes[$name]} =="
}

export SPARK_GRAFT_SF_DIR="$SF"
run battery sbt -batch test
run scaleprobe sbt -batch "runMain graft.ScaleProbe"
run spillprobe sbt -batch "runMain graft.SpillProbe"

fail=0
echo "== gate summary =="
for k in battery scaleprobe spillprobe; do
  echo "$k: exit ${codes[$k]}"
  [ "${codes[$k]}" -ne 0 ] && fail=1
done
exit $fail
