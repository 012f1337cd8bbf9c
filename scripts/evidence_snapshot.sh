#!/usr/bin/env bash
# In-flight evidence snapshotter (r4): copies the LIVE metrics.jsonl of whatever evidence
# stage is currently training from /tmp into the committed evidence/ tree and commits it.
# Rationale: scripts/evidence.py only captures at stage COMPLETION; round 3 lost all its
# at-scale evidence when the round ended mid-stage and /tmp died with the machine. Run in
# a background loop (scripts/evidence_snapshot_loop.sh) so curves survive no matter where
# the round ends.
set -u
cd /root/repo
changed=0
snap() { # snap <src> <dst>
  local src=$1 dst=$2
  [ -f "$src" ] || return 0
  mkdir -p "$(dirname "$dst")"
  if ! cmp -s "$src" "$dst" 2>/dev/null; then
    cp "$src" "$dst" && changed=1
  fi
}
snap /tmp/pfpp_gen_4096/out/everyday/vqvae/metrics.jsonl    evidence/gen4096/vqvae/metrics.inflight.jsonl
snap /tmp/pfpp_gen_4096/out/everyday/denoiser/metrics.jsonl evidence/gen4096/denoiser/metrics.inflight.jsonl
snap /tmp/pfpp_gen_4096/out/everyday/verifier/metrics.jsonl evidence/gen4096/verifier/metrics.inflight.jsonl
snap /tmp/pfpp_gen_4096/matcher_out/metrics.jsonl          evidence/gen4096/matcher_out/metrics.inflight.jsonl
snap /tmp/pfpp_gen_4096/matcher_out_raw/metrics.jsonl      evidence/gen4096/matcher_out_raw/metrics.inflight.jsonl
if [ "$changed" = 1 ]; then
  # pathspec-limited commit: never sweep unrelated concurrently-staged changes into a
  # data-only snapshot commit
  git add evidence/ >/dev/null 2>&1 && \
  git commit -q -m "Evidence snapshot: in-flight stage metrics ($(date -u +%H:%M:%S))

No-Verification-Needed: data-only in-flight metric snapshot" -- evidence/ 2>/dev/null \
    && echo "snapshot committed $(date -u +%H:%M:%S)" \
    || echo "snapshot commit skipped (lock/race) $(date -u +%H:%M:%S)"
fi
