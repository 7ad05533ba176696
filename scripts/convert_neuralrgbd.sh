#!/usr/bin/env bash
# Convert Neural-RGBD sequences to "pin format" (ply folder + KITTI poses).
# Reference workflow: scripts/convert_neuralrgbd.sh.
#
#   ./scripts/convert_neuralrgbd.sh <neural_rgbd_root> <out_root> [seq ...]
set -e
root="${1:?usage: convert_neuralrgbd.sh <root> <out_root> [seq ...]}"
out="${2:?usage: convert_neuralrgbd.sh <root> <out_root> [seq ...]}"
shift 2
seqs=("$@")
[ ${#seqs[@]} -eq 0 ] && seqs=($(ls "$root"))
cd "$(dirname "$0")/.."
for s in "${seqs[@]}"; do
  echo "converting $s ..."
  python -m pin_slam_tpu.dataset.converter.to_pin_format \
    --loader neuralrgbd --input "$root" --sequence "$s" --output "$out/$s"
done
