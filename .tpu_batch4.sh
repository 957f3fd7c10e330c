#!/bin/bash
# Round-3 (resumed) batch 4: post-batch2 priorities. One TPU process at a time.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_batch4
mkdir -p $LOG

echo "[batch4] 1/4 deferred with span-classed binning (A/B vs 88.29)"
BENCH_ALLON=0 BENCH_RT=0 timeout 3000 python -u bench.py \
  > $LOG/def_split.log 2>&1
tail -1 $LOG/def_split.log

echo "[batch4] 2/4 passes TextureSampling drill (all-on)"
PASSES_DETAIL='TextureSampling,BasePass(fill+resolve)' timeout 4200 \
  python -u -m toyrenderer_tpu.tools.passes \
  --scene resources/courtyard.glb --displayresolution 1920x1080 \
  --frames 4 --culling --full > $LOG/passes_tex.log 2>&1
grep -v WARNING $LOG/passes_tex.log | tail -60

echo "[batch4] 3/4 rtbench stress (OR-reduction effect)"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  > $LOG/rtbench_stress.log 2>&1
grep -v WARNING $LOG/rtbench_stress.log | tail -10

echo "[batch4] 4/4 rtbench courtyard"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  --scene courtyard > $LOG/rtbench_courtyard.log 2>&1
grep -v WARNING $LOG/rtbench_courtyard.log | tail -10

echo "[batch4] done"
