#!/bin/bash
# Round-3 follow-up ladder (after the sweep): the measurements the first
# ladder lost to back-to-back probe failures, in priority order, plus the
# decisive 64k-patch int8-attention kernel timing. bench.py's probe now
# retries, so consecutive invocations survive the tunnel's reattach window.
#
# Launch detached (one chip workload at a time; kill ladder 1 first):
#   setsid nohup bash tools/chip_ladder2.sh >/tmp/ladder2_launcher.log 2>&1 &
# The script records its own pid into /tmp/ladder.pid (it is the setsid
# group leader), so bench.py's _evict_background_ladder can always evict it
# — no manual ps/grep step (which would also match the grep itself).
export BENCH_FROM_LADDER=1
echo $$ > /tmp/ladder.pid
cd "$(dirname "$0")/.."
LOG=/tmp/ladder2.log
probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512,512), jnp.bfloat16)
print(float((x@x).sum()))" >/dev/null 2>&1
}
echo "[$(date +%T)] ladder2 waiting for tunnel..." >> $LOG
# bounded wait: give the tunnel 2 h, then bail instead of looping forever
DEADLINE=$(( $(date +%s) + 7200 ))
until probe; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[$(date +%T)] tunnel never came back within 2 h; giving up" >> $LOG
    exit 1
  fi
  sleep 30
done
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
