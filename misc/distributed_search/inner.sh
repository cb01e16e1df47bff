#!/bin/bash
# One chunk of a distributed search: search the raw files listed in $1
# (newline-separated), writing per-run quant into the shared directory.
# Usage: inner.sh <chunk_file> <library> <shared_quant_dir> <scratch_out>
set -euo pipefail
CHUNK_FILE=$1
LIBRARY=$2
QUANT_DIR=$3
OUT_DIR=$4

ARGS=()
while IFS= read -r f; do
  [ -n "$f" ] && ARGS+=(-f "$f")
done < "$CHUNK_FILE"

alphadia-tpu "${ARGS[@]}" -l "$LIBRARY" --quant-dir "$QUANT_DIR" -o "$OUT_DIR" \
  --config-dict '{"general": {"reuse_quant": true}}'
