#!/bin/bash
# Quiet-gated official bench: probe the scheduler floor first, run
# graft.Bench only when the box is calm, retry until the artifact is
# clean (contended == []). Host-steal windows on this box last minutes
# and move the trivial-job p50 12 -> 130 ms with no in-guest signal
# except /proc/stat steal — see JobLatency and the README's latency
# model. Usage: tools/quietbench.sh [max_attempts] [p50_ceiling_ms]
set -u
cd "$(dirname "$0")/.."
ATTEMPTS=${1:-6}
CEILING=${2:-70}
for a in $(seq 1 "$ATTEMPTS"); do
  p50=$(sbt -batch "runMain graft.tools.JobLatency 60 1" 2>&1 |
    grep -oE "p50=[0-9.]+" | head -1 | cut -d= -f2)
  echo "attempt $a: job p50 = ${p50:-?} ms (ceiling $CEILING)"
  if python3 -c "exit(0 if float('${p50:-999}') < $CEILING else 1)"; then
    SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
      sbt -batch "runMain graft.Bench" > /tmp/quietbench_run.log 2>&1
    rc=$?
    cont=$(grep -o '"contended":\[[^]]*\]' /tmp/quietbench_run.log | tail -1)
    total=$(grep -o '"metric":"total","value":[0-9.]*' /tmp/quietbench_run.log |
      tail -1 | cut -d: -f3)
    echo "bench rc=$rc total=${total:-?}s $cont"
    if [ "$rc" = 0 ] && [ "$cont" = '"contended":[]' ]; then
      echo "CLEAN artifact in BENCH.json"
      python3 tools/benchcheck.py BENCH.json README.md
      exit 0
    fi
  fi
  sleep 240
done
echo "no clean run in $ATTEMPTS attempts — inspect /tmp/quietbench_run.log"
exit 1
