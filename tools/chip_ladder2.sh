#!/bin/bash
# Round-3 follow-up ladder (after the sweep): the measurements the first
# ladder lost to back-to-back probe failures, in priority order, plus the
# decisive 64k-patch int8-attention kernel timing. bench.py's probe now
# retries, so consecutive invocations survive the tunnel's reattach window.
#
# Launch detached (one chip workload at a time; kill ladder 1 first):
#   setsid nohup bash tools/chip_ladder2.sh >/tmp/ladder2_launcher.log 2>&1 &
#   ps -eo pid,cmd | grep chip_ladder2   # record pid -> /tmp/ladder.pid
export BENCH_FROM_LADDER=1
cd "$(dirname "$0")/.."
LOG=/tmp/ladder2.log
probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512,512), jnp.bfloat16)
print(float((x@x).sum()))" >/dev/null 2>&1
}
echo "[$(date +%T)] ladder2 waiting for tunnel..." >> $LOG
until probe; do sleep 30; done
echo "[$(date +%T)] 64k-patch int8-attn kernel timing (decisive shape)" >> $LOG
timeout 1200 python -u tools/i8attn_microbench.py --s-vit 65536 --skip-llm >> $LOG 2>&1
echo "[$(date +%T)] e2e vit-scoped int8 attention" >> $LOG
BENCH_MODE=e2e BENCH_QK_INT8=vit BENCH_PV_INT8=vit timeout 1800 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] serving default (headline re-measure)" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] serving vit-scoped int8 attention" >> $LOG
BENCH_QK_INT8=vit BENCH_PV_INT8=vit timeout 2400 python bench.py >> $LOG 2>&1
echo "[$(date +%T)] 16k-token train step (pallas flash backward)" >> $LOG
timeout 3600 python tools/profile_train_step.py --scale 7b --quant int8 --img-side 3584 --steps 4 >> $LOG 2>&1
echo "[$(date +%T)] LADDER2 DONE" >> $LOG
