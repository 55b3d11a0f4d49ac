#!/bin/bash
# Round-4 hardware measurement plan, in priority order, fully automated so a
# short TPU-availability window captures everything (the round-3 bench was
# lost to an outage; see VERDICT.md task #1).
#
# Phases (each logged under /tmp/tpu_session/):
#   1. bench         — driver-protocol benchmark with production defaults
#                      (also warms the persistent compile cache the driver's
#                      own bench run will hit)
#   2. kernels       — fused fwd/bwd kernel probe at tile_h 8 and 16
#                      (stored-O freed VMEM; VERDICT task 2d re-rank)
#   3. ab            — full-step A/Bs: F2F_STORE_O=0/1, F2F_TILE_H=16,
#                      F2F_DOT_BF16=1 (bf16 MXU dot operands; commit dd41962)
#   4. artifact      — accuracy artifact: 17-layer sigma=25 pretrain,
#                      300-frame 540p PSNR trajectory, torch-oracle deviation
#
# Usage: scripts/tpu_session.sh [start-phase]   (default: wait for TPU, then
# run everything). Re-runnable; phases append to their logs.
set -u
cd /root/repo
LOG=/tmp/tpu_session
mkdir -p "$LOG"
START="${1:-wait}"

note() { echo "=== $* at $(date -u +%H:%M:%S) ===" | tee -a "$LOG/summary.log"; }

if [ "$START" = "wait" ]; then
  note "waiting for TPU backend"
  ok=1
  for i in $(seq 1 200); do
    if timeout 180 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices(); x = jnp.ones((128,128))
print('TPU OK', d, float(np.asarray(x@x)[0,0]))" >> "$LOG/wait.log" 2>&1; then
      ok=0; break
    fi
    sleep 180
  done
  if [ $ok -ne 0 ]; then note "TPU never returned; giving up"; exit 1; fi
  note "TPU available"
fi

note "phase 1: bench (production defaults)"
timeout 5800 python bench.py > "$LOG/bench1.out" 2> "$LOG/bench1.err"
note "bench rc=$? $(tail -c 300 "$LOG/bench1.out")"

note "phase 2: kernel probe tile_h 8,16"
timeout 3000 python scripts/perf_probe.py --kernels-only --tile-h 8,16 \
  > "$LOG/kernels.log" 2>&1
note "kernels rc=$?"

note "phase 3a: step A/B stored-O off"
timeout 3000 env F2F_STORE_O=0 python scripts/perf_probe.py \
  --impls fused --step-only > "$LOG/ab_storeo0.log" 2>&1
note "storeo0 rc=$? $(grep -h 'step\[' "$LOG/ab_storeo0.log" | tail -1)"

note "phase 3b: step A/B tile_h=16"
timeout 3000 env F2F_TILE_H=16 python scripts/perf_probe.py \
  --impls fused --step-only > "$LOG/ab_th16.log" 2>&1
note "th16 rc=$? $(grep -h 'step\[' "$LOG/ab_th16.log" | tail -1)"

note "phase 3c: step production default (for the same-session anchor)"
timeout 3000 python scripts/perf_probe.py --impls fused --step-only \
  > "$LOG/ab_default.log" 2>&1
note "default rc=$? $(grep -h 'step\[' "$LOG/ab_default.log" | tail -1)"

note "phase 3f: step A/B dot16 (bf16 MXU operands)"
timeout 3000 env F2F_DOT_BF16=1 python scripts/perf_probe.py \
  --impls fused --step-only > "$LOG/ab_dot16.log" 2>&1
note "dot16 rc=$? $(grep -h 'step\[' "$LOG/ab_dot16.log" | tail -1)"

note "phase 3g: step A/B dot16 + tile_h=16 (lower per-dot overhead at th16)"
timeout 3000 env F2F_DOT_BF16=1 F2F_TILE_H=16 python scripts/perf_probe.py \
  --impls fused --step-only > "$LOG/ab_dot16_th16.log" 2>&1
note "dot16th16 rc=$? $(grep -h 'step\[' "$LOG/ab_dot16_th16.log" | tail -1)"

note "phase 3h: kernel probe dot16 (per-layer fwd/bwd split)"
timeout 3000 env F2F_DOT_BF16=1 python scripts/perf_probe.py --kernels-only \
  --tile-h 8,16 > "$LOG/kernels_dot16.log" 2>&1
note "kernels_dot16 rc=$?"

note "phase 3d: serving eval-impl A/B (affine vs act kernels)"
timeout 3000 python scripts/perf_probe.py --serving-only \
  > "$LOG/ab_serving.log" 2>&1
note "serving rc=$? $(grep -h 'serving\[' "$LOG/ab_serving.log" | tr '\n' ' ')"

note "phase 3e: serving eval-impl A/B at 1080p"
timeout 3000 python scripts/perf_probe.py --serving-only --hw 1080x1920 \
  > "$LOG/ab_serving_1080.log" 2>&1
note "serving1080 rc=$? $(grep -h 'serving\[' "$LOG/ab_serving_1080.log" | tr '\n' ' ')"

note "phase 3i: serving A/B dot16"
timeout 3000 env F2F_DOT_BF16=1 python scripts/perf_probe.py --serving-only \
  > "$LOG/ab_serving_dot16.log" 2>&1
note "serving_dot16 rc=$? $(grep -h 'serving\[' "$LOG/ab_serving_dot16.log" | tr '\n' ' ')"

note "phase 4a: artifact pretrain"
timeout 5800 python scripts/accuracy_artifact.py pretrain \
  > "$LOG/artifact_pretrain.log" 2>&1
note "pretrain rc=$? $(tail -c 200 "$LOG/artifact_pretrain.log")"

note "phase 4b: artifact trajectory (300 frames, 540p)"
timeout 5800 python scripts/accuracy_artifact.py trajectory \
  > "$LOG/artifact_traj.log" 2>&1
note "trajectory rc=$? $(tail -c 300 "$LOG/artifact_traj.log")"

note "phase 4c: artifact oracle deviation"
timeout 5800 python scripts/accuracy_artifact.py oracle \
  > "$LOG/artifact_oracle.log" 2>&1
note "oracle rc=$? $(tail -c 300 "$LOG/artifact_oracle.log")"

note "session complete"
