#!/usr/bin/env bash
# TPU work queue, driven by scripts/supervise_train.sh relaunches.
# Probes the axon tunnel with a bounded fresh process; once it answers, runs the evidence
# stages in order, each marker-gated so relaunches (tunnel-leak OOMs) resume where they
# left off.
#
# Stage ORDER is by evidence-per-minute under an unreliable tunnel (round 3 lost ALL its
# TPU evidence when the tunnel died mid-training): the minutes-scale bench stages (C, D)
# and the checkpoint-resurrection eval (A0) land first; the hours-scale trainings (A, B)
# run last and checkpoint continuously.
set -u -o pipefail
PATH=/opt/venv/bin:$PATH
cd /root/repo
timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('tunnel ok', jax.devices())
" || { echo "tunnel probe failed $(date -u +%H:%M:%S); retrying"; sleep 60; exit 1; }

EV=/root/repo/evidence/bench; mkdir -p "$EV"

bench_ok() { # bench_ok <jsonl> [bench args...] — bench.py emits {"backend_unavailable":
  # true, ...} with rc=0 on a dead tunnel (so the DRIVER always gets a parseable line);
  # here that record must count as FAILURE, or an outage would tee zero-value rows into
  # committed evidence and the .done marker would block re-measurement forever (r4 review)
  local out_file=$1; shift
  local out
  out=$(python bench.py "$@") || return 1
  printf '%s\n' "$out"               # keep the JSON line visible in the live queue log
  printf '%s\n' "$out" >> "$out_file"
  printf '%s' "$out" | grep -q backend_unavailable && return 1
  return 0
}

# stage C: warm-start determinism evidence: after ONE uncounted warm-up (pays the fresh
# compile + seeds the AOT executable), 3 consecutive fresh-process benches must show
# compile_s < 30 (VERDICT r2 #8); then the full-range (3-20 part) serving metric
# (VERDICT r3 #3 — the honest headline next to the P=12 bucket figure)
if [ ! -f /tmp/bench3.done ]; then
  echo "=== stage C: bench determinism $(date -u +%H:%M:%S)"
  : > "$EV/warmup.jsonl"   # single-row semantics: relaunches must not accumulate dupes
  bench_ok "$EV/warmup.jsonl" || exit 1
  for i in 1 2 3; do bench_ok "$EV/determinism.jsonl" || exit 1; done
  bench_ok "$EV/full_range.jsonl" --full-range || exit 1
  touch /tmp/bench3.done
fi

# stage D: VPU dynamic-gather vs MXU onehot gather on the engine hot path
# (VERDICT r3 #4; target >12/s at b8/P=12 or a written negative result). NON-FATAL:
# the dynamic kernel has only ever lowered in interpret mode — a Mosaic lowering failure
# here must not block the training stages below (a crash IS the negative result).
if [ ! -f /tmp/gathercmp.done ]; then
  echo "=== stage D: gather-impl comparison $(date -u +%H:%M:%S)"
  python bench.py | tee -a "$EV/gather_onehot.jsonl" \
    || echo "{\"error\": \"onehot bench failed $(date -u +%H:%M:%S)\"}" >> "$EV/gather_onehot.jsonl"
  PFPP_SA_GATHER=dynamic timeout 2400 python bench.py | tee -a "$EV/gather_dynamic.jsonl" \
    || echo "{\"error\": \"dynamic bench failed rc=$? $(date -u +%H:%M:%S)\"}" >> "$EV/gather_dynamic.jsonl"
  touch /tmp/gathercmp.done
fi

# stage A0: resurrect the r2 512-shape run (its VQ-VAE + denoiser ckpts survive in
# /tmp/pfpp_gen_512/out; its verifier stage never ran). Train ONLY the missing verifier
# (~1000 steps, minutes) and run the held-out engine eval — decomposes the known 0.22
# part_acc into ref-floor vs learned non-ref placement (part_acc_nonref) cheaply, before
# the hours-scale 4096 run. Non-fatal: r2-era ckpts restoring under r4 code is best-effort.
if [ ! -f /tmp/gen512_eval.done ] && [ -d /tmp/pfpp_gen_512/out/everyday/denoiser/ckpt ]; then
  echo "=== stage A0: gen512 resurrection eval $(date -u +%H:%M:%S)"
  touch /tmp/pfpp_gen_512/.stage1_plateau /tmp/pfpp_gen_512/.stage2_plateau
  N_TRAIN=512 N_VAL=32 STEPS_VF=1000 PLATEAU_X=1 \
    python scripts/synthetic_train_eval.py \
    && touch /tmp/gen512_eval.done \
    || echo "stage A0 failed (non-fatal) $(date -u +%H:%M:%S)"
fi

# stage A: main pipeline at scale (AE 4000 + DN 12000 + VF 1000 on 4096 shapes,
# plateau-extended up to PLATEAU_X) + held-out engine metrics (VERDICT r2 #3)
if [ ! -f /tmp/gen4096_train.done ]; then
  echo "=== stage A: synthetic_train_eval $(date -u +%H:%M:%S)"
  # pin the 4096-shape config HERE so supervisor relaunches can never fall back to the
  # script's 256-shape defaults; budgets are plateau-gated floors (PLATEAU_X), r4
  # PLATEAU_X=1.5 (was 3): the r4 host reboot wiped /tmp mid-denoiser, forcing a full
  # from-scratch rerun with ~6h left — cap extensions so stage B (matcher) still runs
  N_TRAIN=4096 N_VAL=32 STEPS_AE=4000 STEPS_DN=12000 STEPS_VF=1000 PLATEAU_X=1.5 \
    python scripts/synthetic_train_eval.py || exit 1
  touch /tmp/gen4096_train.done
fi

# stage A1: train-split sampling eval — decomposes the held-out plateau into
# optimization gap (train ALSO low -> steps/capacity/task) vs generalization gap
# (train high, held-out low -> N_TRAIN too small / synthetic diversity). Non-fatal.
if [ ! -f /tmp/gen4096_trainsplit.done ] && [ -f /tmp/gen4096_train.done ]; then
  echo "=== stage A1: train-split sampling eval $(date -u +%H:%M:%S)"
  N_TRAIN=4096 SUBSET=32 BATCH=16 SPLIT=train timeout 2400 \
    python scripts/eval_train_split.py \
    && touch /tmp/gen4096_trainsplit.done \
    || echo "stage A1 failed (non-fatal) $(date -u +%H:%M:%S)"
fi

# stage B: matcher at scale -> held-out mat_f1 curve + matching_data round trip
# (VERDICT r2 #2a/#2c)
if [ ! -f /tmp/matcher_tpu.done ]; then
  echo "=== stage B: matcher_train_eval $(date -u +%H:%M:%S)"
  # 4096-shape set: same step budget as 120ep@512 but the engine comparison then uses
  # the fresh stage-A checkpoints (the old 512 run died before its verifier stage)
  # NUM_POINTS: the reference trains at 5000 pts/shape (NUM_PC_POINTS,
  # jigsaw_4x4_128_512_250e_cosine_everyday.yaml:29) — but the mat_f1 metric's oracle
  # ceiling FALLS with density (matching/oracle.py; measured on the 4096 val split:
  # 0.70 @ 1000 pts vs 0.44 @ 2500), and sinkhorn is O(N^2): 1000 pts gives the most
  # metric headroom per FLOP. The script logs the ceiling next to the curve.
  # CANONICALIZE=1: per-piece PCA frames (SO(3)-invariant inputs) — the r4 fix for the
  # measured bottleneck (learned affinities are not rotation-robust at 10-epoch budgets;
  # the reference buys robustness with 250 epochs we can't afford on one chip)
  N_TRAIN=4096 N_VAL=32 EPOCHS=10 BATCH=4 NUM_POINTS=1000 VAL_EVERY=1 \
    MAT_EPOCH=1 RIG_EPOCH=8 CANONICALIZE=1 python scripts/matcher_train_eval.py || exit 1
  # stage-B bottleneck decomposition (cls vs affinity features vs solver; CPU-forced,
  # see VALIDATION.md "Matcher bottleneck decomposition") on the at-scale checkpoint
  CKPT=/tmp/pfpp_gen_4096/matcher_out/ckpt DATA=/tmp/pfpp_gen_4096 NUM_POINTS=1000 \
    MAX_PARTS=20 PC_FEAT=128 AFF_FEAT=512 SA_NPOINTS=1024,256,64,16 OUT_TAG=gen4096 \
    CANONICALIZE=1 python scripts/matcher_diagnosis.py \
    || echo "stage B diagnosis failed (non-fatal) $(date -u +%H:%M:%S)"
  touch /tmp/matcher_tpu.done
fi

# stage B2: the reference-parity raw-input variant at the same budget — the controlled
# comparison for the canonicalization claim (skipped automatically if the round runs out
# of wall clock before stage B finishes)
if [ ! -f /tmp/matcher_tpu_raw.done ]; then
  echo "=== stage B2: matcher raw-input variant $(date -u +%H:%M:%S)"
  N_TRAIN=4096 N_VAL=32 EPOCHS=10 BATCH=4 NUM_POINTS=1000 VAL_EVERY=1 \
    MAT_EPOCH=1 RIG_EPOCH=8 CANONICALIZE=0 \
    MATCHER_OUT=/tmp/pfpp_gen_4096/matcher_out_raw \
    python scripts/matcher_train_eval.py || exit 1
  touch /tmp/matcher_tpu_raw.done
fi
# ---------------------------------------------------------------- round-5 stages
# stage F: int8 one-hot gather A/B (VERDICT r4 #6 — the MXU-operand half of the named
# 18% follow-up; the VPU half was the r4 negative). Paired fresh-process runs; the AOT
# fingerprint includes PFPP_SA_GATHER so neither run can reuse the other's executable.
if [ ! -f /tmp/gather_int8.done ]; then
  echo "=== stage F: int8 gather A/B $(date -u +%H:%M:%S)"
  bench_ok "$EV/gather_int8_baseline.jsonl" \
    || echo "stage F baseline failed (non-fatal) $(date -u +%H:%M:%S)"
  PFPP_SA_GATHER=int8 timeout 2400 python bench.py | tee -a "$EV/gather_int8.jsonl" \
    || echo "{\"error\": \"int8 bench failed rc=$? $(date -u +%H:%M:%S)\"}" >> "$EV/gather_int8.jsonl"
  touch /tmp/gather_int8.done
fi

# stage F2: matching-sensitivity diagnosis (the stage-B model-vs-GT comparison came back
# bit-identical; this reruns it with the r5 merge telemetry and publishes WHY — no merges
# vs coincident decisions). Non-fatal.
if [ ! -f /tmp/match_sens.done ]; then
  echo "=== stage F2: matching sensitivity probe $(date -u +%H:%M:%S)"
  N_TRAIN=4096 BATCH=8 timeout 2400 python scripts/matching_sensitivity_probe.py \
    && touch /tmp/match_sens.done \
    || echo "stage F2 failed (non-fatal) $(date -u +%H:%M:%S)"
fi

# stage E: extend the stage-A denoiser past its r5 budget cap — the plateau check said
# done=False (rel_improve 0.083) at the 282-epoch cap, and the held-out engine gap is
# part optimization (VALIDATION.md at-scale section). Clearing the plateau marker lets
# synthetic_train_eval's stage-2 loop continue from the latest checkpoint; PLATEAU_X=4.5
# caps at 846 epochs (~54k steps). Stage 3 + the held-out engine eval re-run at the end,
# refreshing evidence/gen4096/engine/heldout_engine.summary.json with the better model.
if [ ! -f /tmp/gen4096_ext.done ]; then
  echo "=== stage E: extended denoiser training $(date -u +%H:%M:%S)"
  rm -f /tmp/pfpp_gen_4096/.stage2_plateau
  N_TRAIN=4096 N_VAL=32 STEPS_AE=4000 STEPS_DN=12000 STEPS_VF=1000 PLATEAU_X=4.5 \
    python scripts/synthetic_train_eval.py || exit 1
  touch /tmp/gen4096_ext.done
fi

# stage E1: train-split decomposition rerun on the extended checkpoint (same probe as A1,
# fresh marker) — the optimization-vs-generalization verdict should be restated after the
# extension moved the optimization side.
if [ ! -f /tmp/gen4096_trainsplit_ext.done ]; then
  echo "=== stage E1: train-split eval (extended ckpt) $(date -u +%H:%M:%S)"
  N_TRAIN=4096 SUBSET=32 BATCH=16 SPLIT=train timeout 2400 \
    python scripts/eval_train_split.py \
    && touch /tmp/gen4096_trainsplit_ext.done \
    || echo "stage E1 failed (non-fatal) $(date -u +%H:%M:%S)"
fi

# stage E2: verifier-data provenance A/B (reference provenance: verifier data generated
# by the trained denoiser, docs/data_preparation.md). Regenerates verifier data from the
# extended denoiser, trains a fresh verifier, engine A/B vs the synthetic-data verifier —
# the r5 model-vs-GT matching comparison was bit-identical, implicating merge gating.
if [ ! -f /tmp/gen4096_vfdn.done ]; then
  echo "=== stage E2: verifier provenance A/B $(date -u +%H:%M:%S)"
  N_TRAIN=4096 MAX_SAMPLES=1500 STEPS_VF=1000 timeout 7200 \
    python scripts/verifier_regen_eval.py \
    && touch /tmp/gen4096_vfdn.done \
    || echo "stage E2 failed (non-fatal) $(date -u +%H:%M:%S)"
fi

echo "=== queue complete $(date -u +%H:%M:%S)"
exit 0
