#!/bin/bash
# Engine build wrapper — mirrors the reference builder.sh: names the
# flagship config / prior / cmvn / checkpoint files (checkpoint is an
# external download; without it build.py uses synthetic weights).
set -e
cd "$(dirname "$0")"

config=configs/3m_asr_18l32e.yaml
ckpt=${CKPT:-}          # e.g. exp/3m_asr_18l32e.pt (external download)
prior=${PRIOR:-}        # e.g. exp/label.counts
out=${OUT:-engines/3m_asr_18l32e}

# default to the headline bucket; engines also compile lazily per
# bucket at serving time (persisted in the engine's jax_cache)
args=(-c "$config" -o "$out" --buckets "${BUCKETS:-1x256}")
[ -n "$ckpt" ] && args+=(-m "$ckpt")
[ -n "$prior" ] && args+=(-prior "$prior")

python build.py "${args[@]}" "$@"
