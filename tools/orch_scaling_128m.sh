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

probe() {  # busy-loop ceiling, pinned to cores 0..N-1
  taskset -c 0-$(( $1 - 1 )) python - "$1" <<'PYEOF'
import multiprocessing as mp, sys, time
def burn(n):
    x = 0
    for i in range(n): x += i * i
    return x
procs = int(sys.argv[1])
ctx = mp.get_context("fork")
with ctx.Pool(procs) as p:
    p.map(burn, [200_000] * procs)
    t0 = time.time()
    p.map(burn, [20_000_000] * procs * 2)
    print(f"probe {procs}w: {procs*2*20_000_000/(time.time()-t0)/1e6:.1f} Mops")
PYEOF
}

startup() {  # pinned no-op submit
  local n=$1
  SECONDS=0
  taskset -c 0-$((n-1)) spark-submit --master local[$n] --driver-memory 8g \
    --py-files engine.zip /tmp/noop_job.py 2>/dev/null >/dev/null
  echo "startup local[$n]: ${SECONDS}s"
}

run_one() {
  local n=$1 tag=$2 rc=0
  SECONDS=0
  taskset -c 0-$((n-1)) spark-submit --master local[$n] --driver-memory 8g \
    --py-files engine.zip examples/validate_job.py \
    --docs $DOCS --catalog $CAT --out $OUTROOT/out_${n}_${tag} \
    --run-id r6-128m-${n}-${tag} --epoch 0 2>/dev/null >/dev/null || rc=$?
  # set -e would abort before the diagnostic otherwise; rc captured via ||
  echo "local[$n] run$tag: ${SECONDS}s rc=$rc dirs=$(ls $OUTROOT/out_${n}_${tag} 2>/dev/null | wc -l)"
}

echo "=== probes (pre) ==="; probe 2; probe 8
echo "=== startup ==="; startup 2; startup 8
echo "=== local[8] ==="; run_one 8 a; run_one 8 b
echo "=== local[2] ==="; run_one 2 a; run_one 2 b
echo "=== probes (post) ==="; probe 2; probe 8
