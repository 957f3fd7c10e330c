#!/bin/bash
# Round-3 (resumed) measurement batch. One TPU process at a time.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_batch2
mkdir -p $LOG

echo "[batch2] 1/4 deferred default (fresh, post OR-reduction)"
BENCH_ALLON=0 BENCH_RT=0 timeout 3000 python -u bench.py \
  > $LOG/def_default.log 2>&1
tail -1 $LOG/def_default.log

echo "[batch2] 2/4 deferred tile 8x256 slots 8x1"
BENCH_ALLON=0 BENCH_RT=0 BENCH_TILE_H=8 BENCH_TILE_W=256 \
  BENCH_BIN_SLOTS=8x1 timeout 3000 python -u bench.py \
  > $LOG/def_8x256.log 2>&1
tail -1 $LOG/def_8x256.log

echo "[batch2] 3/4 full bench (all-on, autotune)"
timeout 5400 python -u bench.py > $LOG/bench_full.log 2>&1
tail -1 $LOG/bench_full.log

echo "[batch2] 4/4 passes full trace"
timeout 4200 python -u -m toyrenderer_tpu.tools.passes \
  --scene resources/courtyard.glb --displayresolution 1920x1080 \
  --frames 4 --culling --full > $LOG/passes_full.log 2>&1
grep -v WARNING $LOG/passes_full.log | tail -32

echo "[batch2] done"
