#!/usr/bin/env bash
# Dev-only: the local[N] thread sweep over the byte-bound media arms
# (VERDICT r11 #1 — prove the decode floor thread-scales over REAL FILES).
# Produces parbench_<N>.json per config; fold them with
#   python3 tools/make_parallelism_artifact.py SCALING_rXX_par.json "<note>" \
#     /tmp/parbench_8.json /tmp/parbench_16.json /tmp/parbench_32.json
#
# Usage: tools/run_parbench.sh SF_DIR OUT_DIR [queries] [N...]
# Defaults: the three real-file media arms, N in {8, 16, 32}.
set -euo pipefail
SF_DIR="${1:?sf dir}"; OUT_DIR="${2:?out dir}"
QUERIES="${3:-media_phash_pairs_files,media_audio_dups_files,media_video_dups_files}"
shift $(( $# >= 3 ? 3 : $# ))
if [ $# -gt 0 ]; then NS=("$@"); else NS=(8 16 32); fi
mkdir -p "$OUT_DIR"
for N in "${NS[@]}"; do
  echo "=== local[$N] ==="
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$N" \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    sbt "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
    > "$OUT_DIR/parbench_$N.json"
  tail -c 300 "$OUT_DIR/parbench_$N.json"; echo
done
