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

args=(-c "$config" -o "$out")
[ -n "$ckpt" ] && args+=(-m "$ckpt")
[ -n "$prior" ] && args+=(-prior "$prior")

python build.py "${args[@]}" "$@"
