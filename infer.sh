#!/bin/bash
# Inference wrapper — mirrors the reference infer.sh.
set -e
cd "$(dirname "$0")"

engine=${OUT:-engines/3m_asr_18l32e}
feat=${FEAT:-data/inputs/feat.1x206x40.npy}

python infer.py -p "$engine" -i "$feat" "$@"
