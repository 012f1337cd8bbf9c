#!/usr/bin/env bash
# TPU work queue, driven by scripts/supervise_train.sh relaunches.
# Probes the axon tunnel with a bounded fresh process; once it answers, runs the round-3
# evidence queue in order, each stage marker-gated so relaunches (tunnel-leak OOMs) resume
# where they left off.
set -u
PATH=/opt/venv/bin:$PATH
cd /root/repo
timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('tunnel ok', jax.devices())
" || { echo "tunnel probe failed $(date -u +%H:%M:%S); retrying"; sleep 60; exit 1; }

# stage A: main pipeline at scale (AE 3000 + DN 12000 + VF 1000 on 4096 shapes) +
# held-out engine metrics (VERDICT r2 #3)
if [ ! -f /tmp/gen4096_train.done ]; then
  echo "=== stage A: synthetic_train_eval $(date -u +%H:%M:%S)"
  python scripts/synthetic_train_eval.py || exit 1
  touch /tmp/gen4096_train.done
fi

# stage B: matcher at scale -> held-out mat_f1 curve + matching_data round trip
# (VERDICT r2 #2a/#2c); reuses the 512-shape gen set
if [ ! -f /tmp/matcher_tpu.done ]; then
  echo "=== stage B: matcher_train_eval $(date -u +%H:%M:%S)"
  # 4096-shape set: same step budget as 120ep@512 but the engine comparison then uses
  # the fresh stage-A checkpoints (the old 512 run died before its verifier stage)
  # NUM_POINTS: the reference trains at 5000 pts/shape (NUM_PC_POINTS,
  # jigsaw_4x4_128_512_250e_cosine_everyday.yaml:29) — but the mat_f1 metric's oracle
  # ceiling FALLS with density (matching/oracle.py; measured on the 4096 val split:
  # 0.70 @ 1000 pts vs 0.44 @ 2500), and sinkhorn is O(N^2): 1000 pts gives the most
  # metric headroom per FLOP. The script logs the ceiling next to the curve.
  N_TRAIN=4096 N_VAL=32 EPOCHS=10 BATCH=4 NUM_POINTS=1000 VAL_EVERY=1 \
    MAT_EPOCH=1 RIG_EPOCH=8 python scripts/matcher_train_eval.py || exit 1
  touch /tmp/matcher_tpu.done
fi

# stage C: warm-start determinism evidence: 3 consecutive fresh-process benches must show
# compile_s < 30 via the AOT executable (VERDICT r2 #8), then the full-range serving metric
if [ ! -f /tmp/bench3.done ]; then
  echo "=== stage C: bench determinism $(date -u +%H:%M:%S)"
  for i in 1 2 3; do python bench.py || exit 1; done
  python bench.py --full-range || exit 1
  touch /tmp/bench3.done
fi
echo "=== queue complete $(date -u +%H:%M:%S)"
exit 0
