#!/bin/bash
# 512M-doc orchestration rung (late r7): extends the 16M/64M/128M/256M
# fixed-cost-amortization series one more doubling. local[8] only —
# the 2->8 efficiency pair is evidenced at 16M (where both sizes fit a
# session); this rung measures whether absolute throughput at the SAME
# size keeps rising as fixed costs amortize over 2x the data.
# Identical mechanics to orch_scaling_256m.sh: taskset-pinned literal
# spark-submit --py-files engine.zip, 8g driver, fresh JVM + out-dir
# per run, busy-loop ceiling probed in-session.
set -e
cd /root/repo
N=512000000
DOCS=.bench_cache/documents_e0_${N}
CAT=.bench_cache/asset_catalog_${N}
OUTROOT=/tmp/orch512
rm -rf $OUTROOT; mkdir -p $OUTROOT

if [ ! -f "$DOCS/_SUCCESS" ] || [ ! -f "$CAT/_SUCCESS" ]; then
  # _SUCCESS markers, not bare dirs: a generation killed mid-write leaves
  # a partial table that a dir check would silently accept (review catch);
  # ensure_bench_data is idempotent and re-fills whichever path is missing
  echo "=== generating ${N}-doc table ==="
  SECONDS=0
  SPARK_GRAFT_BENCH_DOCS=$N python - <<'PYEOF'
import sys
sys.path.insert(0, "/root/repo")
from schema_drift_detector_spark.session import get_spark
import bench
spark = get_spark("gen512", master="local[32]", shuffle_partitions=64,
                  extra_conf=bench.BENCH_CONF)
spark.sparkContext.setLogLevel("ERROR")
print(bench.ensure_bench_data(spark))
spark.stop()
PYEOF
  echo "gen: ${SECONDS}s"
fi

probe() {
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

run_one() {
  local n=$1 tag=$2 rc=0
  SECONDS=0
  taskset -c 0-$((n-1)) spark-submit --master local[$n] --driver-memory 8g \
    --py-files engine.zip examples/validate_job.py \
    --docs $DOCS --catalog $CAT --out $OUTROOT/out_${n}_${tag} \
    --run-id r7-512m-${n}-${tag} --epoch 0 2>/dev/null >/dev/null || rc=$?
  # set -e would abort before the diagnostic otherwise; rc captured via ||
  echo "local[$n] run$tag: ${SECONDS}s rc=$rc dirs=$(ls $OUTROOT/out_${n}_${tag} 2>/dev/null | wc -l)"
}

echo "=== probes (pre) ==="; probe 8
echo "=== local[8] ==="; run_one 8 a; run_one 8 b
echo "=== probes (post) ==="; probe 8
