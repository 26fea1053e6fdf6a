#!/bin/bash
# Controlled A/B debug run WITH loop-closure rigid transform of gaussians.
# Role parity: /root/reference/scripts/run_debug_rigidtransform.sh (same CLI
# shape, artdeco_tpu flags).  Pair with run_debug_norigidtransform.sh and
# diff the metadata/trajectories to isolate rigid-transform regressions.
set -e
work_dir=$(pwd)
base_dir=${BASE_DIR:-./data/self_captured_baselines}
result_dir=${RESULT_DIR:-./results}
img_dir=${IMG_DIR:-images}
run() { printf '%q ' "$@"; echo; "$@"; }

for src_dir in "$base_dir"/*; do
    [[ ! -d "$src_dir/$img_dir" ]] && { echo "No $img_dir/ in $src_dir"; continue; }
    dst_dir="$result_dir/$(basename "$src_dir")/artdeco-tpu-rigidtransform"
    [[ -f "$dst_dir/run_metadata.json" ]] && { echo "$dst_dir contains results"; continue; }
    run python run_system.py \
        -s "$src_dir" \
        -i "$img_dir" \
        -m "$dst_dir" \
        --config config/base.yaml \
        -d selfCaptured \
        --num_key_iterations 30 \
        --downsampling 2.0 \
        --test_hold 8 \
        --rigid_transform_gaussians
done
