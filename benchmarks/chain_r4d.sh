#!/bin/bash
# Round-4 TPU job chain: runs after the bench sweep exits.
#   1. save bench JSON; 2. perf_cost (cost analysis, cache-hit compiles);
#   3. VILANRO supervised ceiling on TPU; 4. SPRITES r4 retrain + v4-judge
#   eval.  Sequential — ONE TPU process at a time (device claim is
#   exclusive; see CLAUDE.md).
set -u
cd /root/repo
LOG=/tmp/chain_r4d.log
exec >> "$LOG" 2>&1
echo "=== chain_r4d start $(date)"

# 1. wait for the bench process to exit
BENCH_PID=$(cat /tmp/bench_r4b.pid 2>/dev/null || echo "")
while [ -n "$BENCH_PID" ] && kill -0 "$BENCH_PID" 2>/dev/null; do sleep 30; done
echo "bench exited $(date)"
# save its final JSON line for perf_cost's join
grep -h '"curve"' /tmp/bench_r4b.log | tail -1 > /tmp/bench_r4b.json || true

# 2. cost analysis (compiles are persistent-cache hits from bench/perf_diag)
echo "--- perf_cost $(date)"
BENCH_JSON=/tmp/bench_r4b.json timeout 7200 \
    python benchmarks/perf_cost.py > /tmp/perf_cost.log 2>&1
echo "perf_cost rc=$?"

# 3. supervised ceiling on the TPU (the CPU attempt died at epoch 0)
echo "--- ceiling $(date)"
CEILING_EPOCHS=60 timeout 3600 \
    python benchmarks/vilanro_supervised_ceiling.py data/vilanro/D1way_r4 \
    > /tmp/ceiling_tpu.log 2>&1
echo "ceiling rc=$?"

# 4. SPRITES retrain under the v4 judge (VERDICT r3 item 4)
echo "--- sprites_r4_dreg_up $(date)"
timeout 21600 python main.py --cfg configs/round4/sprites_r4_dreg_up.yml \
    > /tmp/sprites_r4_train.log 2>&1
echo "sprites rc=$?"
echo "=== chain_r4d done $(date)"
