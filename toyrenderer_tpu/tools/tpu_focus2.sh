#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_focus
mkdir -p $LOG
echo "[f2] 1/2 deferred peel_merge=0.15"
BENCH_ALLON=0 BENCH_RT=0 BENCH_PEEL_MERGE=0.15 timeout 2400 \
  python -u bench.py > $LOG/def_merge15.log 2>&1
tail -1 $LOG/def_merge15.log
echo "[f2] 2/2 all-on peel_merge=0.15"
BENCH_RT=0 BENCH_PEEL_MERGE=0.15 timeout 3600 python -u bench.py \
  > $LOG/allon_merge15.log 2>&1
tail -1 $LOG/allon_merge15.log
echo "[f2] done"
