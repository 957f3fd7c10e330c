#!/bin/bash
# Round-3 (resumed) batch 5: honest-fence rtbench + masked-compact A/B.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_batch5
mkdir -p $LOG

echo "[batch5] 1/4 rtbench stress (scalar fence)"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  > $LOG/rtbench_stress.log 2>&1
grep -v WARNING $LOG/rtbench_stress.log | tail -8

echo "[batch5] 2/4 rtbench courtyard (scalar fence)"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  --scene courtyard > $LOG/rtbench_courtyard.log 2>&1
grep -v WARNING $LOG/rtbench_courtyard.log | tail -8

echo "[batch5] 3/4 deferred masked-compact 0.15"
BENCH_ALLON=0 BENCH_RT=0 BENCH_MASKED_COMPACT=0.15 timeout 3000 \
  python -u bench.py > $LOG/def_mcompact.log 2>&1
tail -1 $LOG/def_mcompact.log

echo "[batch5] 4/4 all-on masked-compact 0.15"
BENCH_MASKED_COMPACT=0.15 timeout 5400 python -u bench.py \
  > $LOG/allon_mcompact.log 2>&1
tail -1 $LOG/allon_mcompact.log

echo "[batch5] 5/5 deferred tile 8x128 slots 8x1 + masked-compact"
BENCH_ALLON=0 BENCH_RT=0 BENCH_TILE_H=8 BENCH_BIN_SLOTS=8x1 \
  BENCH_MASKED_COMPACT=0.15 timeout 3000 python -u bench.py \
  > $LOG/def_8x128.log 2>&1
tail -1 $LOG/def_8x128.log

echo "[batch5] done"
