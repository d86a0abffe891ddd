#!/usr/bin/env bash
# THE bench command. Runs the sbt Bench main, then emits the bench JSON as
# this wrapper's FINAL (and only) stdout line — nothing inside sbt can beat
# the `[success]` trailer sbt appends after the main returns, so the JSON
# must be printed AFTER sbt exits. All sbt/Spark output goes to stderr.
#
# Usage: tools/bench.sh            (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
#                                   SPARK_GRAFT_BENCH_PAGES — same as Bench)
# stdout: exactly one line, the contents of BENCH_OUT.json.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Bench" 1>&2
cat BENCH_OUT.json
echo
