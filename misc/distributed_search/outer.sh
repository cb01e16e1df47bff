#!/bin/bash
# Distributed search driver (Slurm array or plain ssh fan-out).
# Usage: outer.sh <file_list> <library> <shared_dir> <n_chunks>
# 1. split the raw-file list into chunks
# 2. run inner.sh per chunk (one TPU host each; sbatch array shown)
# 3. aggregate: a final run over ALL files with reuse_quant reuses every
#    per-run parquet from the shared quant dir and only builds outputs.
set -euo pipefail
FILE_LIST=$1
LIBRARY=$2
SHARED=$3
N=${4:-4}

mkdir -p "$SHARED/chunks" "$SHARED/quant" "$SHARED/out"
split -n "l/$N" -d "$FILE_LIST" "$SHARED/chunks/chunk_"

i=0
for chunk in "$SHARED"/chunks/chunk_*; do
  if command -v sbatch >/dev/null; then
    sbatch --job-name "dia_$i" --wrap \
      "bash $(dirname "$0")/inner.sh $chunk $LIBRARY $SHARED/quant $SHARED/out/node_$i"
  else
    bash "$(dirname "$0")/inner.sh" "$chunk" "$LIBRARY" "$SHARED/quant" "$SHARED/out/node_$i" &
  fi
  i=$((i + 1))
done
wait || true

# aggregation over all runs (per-run work skipped via reuse_quant)
ARGS=()
while IFS= read -r f; do [ -n "$f" ] && ARGS+=(-f "$f"); done < "$FILE_LIST"
alphadia-tpu "${ARGS[@]}" -l "$LIBRARY" --quant-dir "$SHARED/quant" \
  -o "$SHARED/out/final" --config-dict '{"general": {"reuse_quant": true}}'
