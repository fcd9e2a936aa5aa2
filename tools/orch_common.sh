# Shared mechanics for the orchestration rung scripts
# (orch_scaling_{128m,256m,512m}.sh) — ONE definition of the busy-loop
# ceiling probe and the pinned validate run, so a fix to either applies
# to every rung and the cross-rung amortization series stays comparable.
# Callers must set: DOCS, CAT, OUTROOT, RUNID_PREFIX.

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

run_one() {
  local n=$1 tag=$2 rc=0
  SECONDS=0
  taskset -c 0-$((n-1)) spark-submit --master local[$n] --driver-memory 8g \
    --py-files engine.zip examples/validate_job.py \
    --docs $DOCS --catalog $CAT --out $OUTROOT/out_${n}_${tag} \
    --run-id ${RUNID_PREFIX}-${n}-${tag} --epoch 0 2>/dev/null >/dev/null || rc=$?
  # set -e would abort before the diagnostic otherwise; rc captured via ||
  echo "local[$n] run$tag: ${SECONDS}s rc=$rc dirs=$(ls $OUTROOT/out_${n}_${tag} 2>/dev/null | wc -l)"
}
