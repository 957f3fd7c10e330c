#!/bin/bash
# Clean re-measure after the packed frame-input fix. QUIET HOST: nothing
# else may run during this batch.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_batch4
mkdir -p $LOG

echo "[batch4] 1/3 deferred (packed inputs)"
BENCH_ALLON=0 BENCH_RT=0 timeout 3000 python -u bench.py \
  > $LOG/def.log 2>&1
tail -1 $LOG/def.log

echo "[batch4] 2/3 full bench (packed inputs)"
timeout 5400 python -u bench.py > $LOG/full.log 2>&1
tail -1 $LOG/full.log

echo "[batch4] 3/3 rtbench stress (quiet host, OR-reduction re-measure)"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  > $LOG/rtbench_stress.log 2>&1
grep -v WARNING $LOG/rtbench_stress.log | tail -8

echo "[batch4] done"
