#!/bin/bash
# Round-3 on-chip measurement ladder (runs automatically when the TPU
# tunnel heals; ONE chip workload at a time; bench.py evicts this ladder
# by pid if the driver's own bench run arrives mid-ladder).
#
# Launch detached, own process group, pid recorded for the evictor:
#   setsid nohup bash tools/chip_ladder.sh >/tmp/ladder_launcher.log 2>&1 &
#   ps -eo pid,pgid,cmd | grep chip_ladder   # record pid -> /tmp/ladder.pid
#
# Steps (results append to /tmp/ladder.log):
#   1. int8-attention microbench (tools/i8attn_microbench.py)
#   2. e2e prefill tiers: baseline W8A8 / +QK-int8 / +QK+PV-int8
#   3. serving headline re-measure, then with the int8 attention tiers
#   4. reduce_layer sweep -> docs/sweep_reduce_layer.json (VERDICT r2 #4)
#   5. 16k-token train step (the pallas flash backward's headline)
export BENCH_FROM_LADDER=1
cd "$(dirname "$0")/.."
LOG=/tmp/ladder.log
probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512,512), jnp.bfloat16)
print(float((x@x).sum()))" >/dev/null 2>&1
}
echo "[$(date +%T)] ladder waiting for tunnel..." >> $LOG
until probe; do sleep 60; done
echo "[$(date +%T)] tunnel OK; int8-attn microbench" >> $LOG
timeout 1200 python -u tools/i8attn_microbench.py >> $LOG 2>&1
echo "[$(date +%T)] e2e baseline (w8a8 prefill tier)" >> $LOG
BENCH_MODE=e2e timeout 1800 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] e2e qk8" >> $LOG
BENCH_MODE=e2e BENCH_QK_INT8=1 timeout 1800 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] e2e all8 (qk+pv)" >> $LOG
BENCH_MODE=e2e BENCH_PV_INT8=1 timeout 1800 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] serving default (headline re-measure)" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] serving qk+pv int8" >> $LOG
BENCH_QK_INT8=1 BENCH_PV_INT8=1 timeout 2400 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] reduce_layer sweep (VERDICT r2 #4)" >> $LOG
timeout 3600 python tools/sweep_reduce_layer.py >> $LOG 2>&1
echo "[$(date +%T)] 16k-token train step (pallas flash backward)" >> $LOG
timeout 3600 python tools/profile_train_step.py --scale 7b --quant int8 --img-side 3584 --steps 4 >> $LOG 2>&1
echo "[$(date +%T)] LADDER DONE" >> $LOG
