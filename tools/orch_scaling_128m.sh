#!/bin/bash
# 128M-doc two-size orchestration evidence (r5 verdict, Next round #7).
# Identical protocol to the r4/r5 BENCH/BASELINE.md sections: literal
# taskset-pinned spark-submit --py-files, --driver-memory 8g at BOTH
# sizes, fresh JVM + fresh out-dir per run, startup measured by a
# pinned no-op submit, busy-loop ceiling probed in-session.
set -e
cd /root/repo
DOCS=.bench_cache/documents_e0_128000000
CAT=.bench_cache/asset_catalog_128000000
OUTROOT=/tmp/orch128
rm -rf $OUTROOT; mkdir -p $OUTROOT

RUNID_PREFIX=r6-128m
source "$(dirname "$0")/orch_common.sh"


startup() {  # pinned no-op submit
  local n=$1
  SECONDS=0
  taskset -c 0-$((n-1)) spark-submit --master local[$n] --driver-memory 8g \
    --py-files engine.zip /tmp/noop_job.py 2>/dev/null >/dev/null
  echo "startup local[$n]: ${SECONDS}s"
}


echo "=== probes (pre) ==="; probe 2; probe 8
echo "=== startup ==="; startup 2; startup 8
echo "=== local[8] ==="; run_one 8 a; run_one 8 b
echo "=== local[2] ==="; run_one 2 a; run_one 2 b
echo "=== probes (post) ==="; probe 2; probe 8
