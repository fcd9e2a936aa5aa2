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

RUNID_PREFIX=r7-512m
source "$(dirname "$0")/orch_common.sh"

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



echo "=== probes (pre) ==="; probe 8
echo "=== local[8] ==="; run_one 8 a; run_one 8 b
echo "=== probes (post) ==="; probe 8
