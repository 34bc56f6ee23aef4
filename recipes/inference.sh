#!/usr/bin/env bash
# Canonical eval sweep (the reference inference.sh): 1-step generation at
# guidance 4 and 5, batch 32, EDM + EMA + bf16, seed 0.
set -euo pipefail

batch_size=32
num_steps=1
ref_dir="data/audiocaps_test_references/subset"
ref_json="data/test_audiocaps_subset.json"

for model_dir in saved/stage2 saved/stage3; do
  for guidance in 4 5; do
    python cli/inference.py \
      --original_args="$model_dir/summary.jsonl" \
      --model="$model_dir/best" \
      --test_file=$ref_json --test_references=$ref_dir --seed=0 \
      --stage=2 --guidance_scale_input=$guidance --guidance_scale_post=1 \
      --num_steps=$num_steps --batch_size=$batch_size \
      --use_edm --use_ema --use_bf16 \
      --output_dir "outputs/$(basename $model_dir)_w${guidance}"
  done
done
