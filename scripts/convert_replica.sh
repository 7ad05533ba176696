#!/usr/bin/env bash
# Convert Replica RGB-D sequences to "pin format" (ply folder + KITTI poses).
# Reference workflow: scripts/convert_replica.sh (wrapper around the
# per-dataset converter); here one loader-backed converter covers all sets.
#
#   ./scripts/convert_replica.sh <replica_root> <out_root> [seq ...]
set -e
root="${1:?usage: convert_replica.sh <replica_root> <out_root> [seq ...]}"
out="${2:?usage: convert_replica.sh <replica_root> <out_root> [seq ...]}"
shift 2
seqs=("$@")
[ ${#seqs[@]} -eq 0 ] && seqs=(room0 room1 room2 office0 office1 office2 office3 office4)
cd "$(dirname "$0")/.."
for s in "${seqs[@]}"; do
  echo "converting $s ..."
  python -m pin_slam_tpu.dataset.converter.to_pin_format \
    --loader replica --input "$root" --sequence "$s" --output "$out/$s"
done
