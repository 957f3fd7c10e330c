#!/bin/bash
# Sequential TPU measurement batch (one TPU process at a time).
# Waits for the remote-compile tunnel, then runs the queued A/Bs.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_batch
mkdir -p $LOG

probe() {
  timeout 100 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jax.jit(lambda a: a*2+1)(jnp.arange(23.0))
print('ok', float(np.asarray(x)[-1]))" 2>/dev/null | grep -q ok
}

echo "[batch] waiting for tunnel..."
for i in $(seq 1 200); do
  if probe; then echo "[batch] tunnel up (try $i)"; break; fi
  sleep 110
done
probe || { echo "[batch] tunnel never came up"; exit 1; }

echo "[batch] 1/7 rtbench stress (all kernels: packet/gdir/sah)"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  > $LOG/rtbench_stress.log 2>&1
grep -v WARNING $LOG/rtbench_stress.log | tail -8

echo "[batch] 2/7 rtbench courtyard"
timeout 4000 python -u -m toyrenderer_tpu.tools.rtbench \
  --scene courtyard > $LOG/rtbench_courtyard.log 2>&1
grep -v WARNING $LOG/rtbench_courtyard.log | tail -8

echo "[batch] 3/7 deferred chunk=256 (current default)"
BENCH_ALLON=0 BENCH_RT=0 timeout 3000 python -u bench.py \
  > $LOG/def_c256.log 2>&1
tail -1 $LOG/def_c256.log

echo "[batch] 4/7 deferred chunk=128"
BENCH_ALLON=0 BENCH_RT=0 BENCH_RASTER_CHUNK=128 timeout 3000 \
  python -u bench.py > $LOG/def_c128.log 2>&1
tail -1 $LOG/def_c128.log

echo "[batch] 5/7 full bench (all-on)"
timeout 5400 python -u bench.py > $LOG/bench_full.log 2>&1
tail -1 $LOG/bench_full.log

echo "[batch] 6/7 passes GI drill (all-on)"
PASSES_DETAIL='GI(DDGI)' timeout 4200 python -u -m \
  toyrenderer_tpu.tools.passes --scene resources/courtyard.glb \
  --displayresolution 1920x1080 --frames 4 --culling --full \
  > $LOG/passes_gi.log 2>&1
grep -v WARNING $LOG/passes_gi.log | tail -40
echo "[batch] 7/7 plaza deferred+shadowed 1080p"
BENCH_SCENE=plaza BENCH_ALLON=0 BENCH_PAIR_CAPACITY_FRAC=0.25 \
  timeout 5400 python -u bench.py > $LOG/bench_plaza.log 2>&1
tail -1 $LOG/bench_plaza.log

echo "[batch] done"
