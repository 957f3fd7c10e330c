#!/bin/bash
# Follow-up A/Bs (run AFTER .tpu_batch2.sh finishes; one TPU process at a time).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_batch3
mkdir -p $LOG

echo "[batch3] 1/5 rtbench stress (OR-reduction effect)"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  > $LOG/rtbench_stress.log 2>&1
grep -v WARNING $LOG/rtbench_stress.log | tail -8

echo "[batch3] 2/5 deferred tile 8x128"
BENCH_ALLON=0 BENCH_RT=0 BENCH_TILE_H=8 timeout 3000 python -u bench.py \
  > $LOG/def_8x128.log 2>&1
tail -1 $LOG/def_8x128.log

echo "[batch3] 3/5 deferred masked-compact 0.15"
BENCH_ALLON=0 BENCH_RT=0 BENCH_MASKED_COMPACT=0.15 timeout 3000 \
  python -u bench.py > $LOG/def_mcompact.log 2>&1
tail -1 $LOG/def_mcompact.log

echo "[batch3] 3b/5 deferred bin slots 2x2"
BENCH_ALLON=0 BENCH_RT=0 BENCH_BIN_SLOTS=2x2 timeout 3000 \
  python -u bench.py > $LOG/def_slots22.log 2>&1
tail -1 $LOG/def_slots22.log

echo "[batch3] 4/5 passes GI drill (all-on)"
PASSES_DETAIL='GI(DDGI)' timeout 4200 python -u -m \
  toyrenderer_tpu.tools.passes --scene resources/courtyard.glb \
  --displayresolution 1920x1080 --frames 4 --culling --full \
  > $LOG/passes_gi.log 2>&1
grep -v WARNING $LOG/passes_gi.log | tail -45

echo "[batch3] 5/5 rtbench courtyard"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  --scene courtyard > $LOG/rtbench_courtyard.log 2>&1
grep -v WARNING $LOG/rtbench_courtyard.log | tail -8

echo "[batch3] done"
