#!/bin/bash
# Focused A/B batch: masked-compact resolve (with channel pruning) and
# fill tile shape.  One TPU process at a time.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_focus
mkdir -p $LOG

echo "[focus] 1/5 deferred baseline (compact off)"
BENCH_ALLON=0 BENCH_RT=0 timeout 2400 python -u bench.py \
  > $LOG/def_base.log 2>&1
tail -1 $LOG/def_base.log

echo "[focus] 2/5 deferred compact=0.25"
BENCH_ALLON=0 BENCH_RT=0 BENCH_MASKED_COMPACT=0.25 timeout 2400 \
  python -u bench.py > $LOG/def_compact.log 2>&1
tail -1 $LOG/def_compact.log

echo "[focus] 3/5 deferred tile 8x128 slots 8x1"
BENCH_ALLON=0 BENCH_RT=0 BENCH_TILE_H=8 BENCH_TILE_W=128 \
  BENCH_BIN_SLOTS=8x1 timeout 2400 python -u bench.py \
  > $LOG/def_t8x128.log 2>&1
tail -1 $LOG/def_t8x128.log

echo "[focus] 4/5 all-on default"
BENCH_RT=0 timeout 3600 python -u bench.py > $LOG/allon_base.log 2>&1
tail -1 $LOG/allon_base.log

echo "[focus] 5/5 all-on compact=0.25"
BENCH_RT=0 BENCH_MASKED_COMPACT=0.25 timeout 3600 python -u bench.py \
  > $LOG/allon_compact.log 2>&1
tail -1 $LOG/allon_compact.log
echo "[focus] done"
