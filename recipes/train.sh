#!/usr/bin/env bash
# Canonical three-stage training recipes (the reference train.sh, adapted to
# the TPU CLI). Hyperparameters mirror reference train.sh:18-46.
set -euo pipefail

train_file="data/train_audiocaps.json"
validation_file="data/valid_audiocaps.json"
test_file="data/test_audiocaps_subset.json"
text_encoder_name="google/flan-t5-large"

unet_model_config="configs/tango_diffusion_light.json"
tango_model="ckpt/LightweightLDM_pytorch_model_2.bin"
vae_checkpoint="ckpt/audioldm-s-full.ckpt"

stage1_model="saved/stage1/best"
stage2_model="saved/stage2/epoch_60"

# Stage 1 -- distill into a variable-guidance latent diffusion model
python cli/train.py --stage 1 \
  --train_file=$train_file --validation_file=$validation_file --test_file=$test_file \
  --text_encoder_name=$text_encoder_name --freeze_text_encoder \
  --unet_model_config=$unet_model_config --tango_model=$tango_model \
  --vae_checkpoint=$vae_checkpoint \
  --gradient_accumulation_steps=8 --per_device_train_batch_size=4 --per_device_eval_batch_size=6 \
  --augment --num_train_epochs=50 --teacher_guidance_scale=-1 \
  --target_ema_decay=.95 --ema_decay=.999 --learning_rate=1e-4 --adam_weight_decay=0 \
  --checkpointing_steps=best --num_diffusion_steps=18 --num_warmup_steps=900 \
  --use_bf16 --snr_gamma 5 --output_dir saved/stage1

# Stage 2 -- distill into a CFG-aware latent-consistency model (EDM recipe)
python cli/train.py --stage 2 \
  --train_file=$train_file --validation_file=$validation_file --test_file=$test_file \
  --text_encoder_name=$text_encoder_name --freeze_text_encoder \
  --unet_model_config=$unet_model_config --tango_model=$tango_model --stage1_model=$stage1_model \
  --vae_checkpoint=$vae_checkpoint \
  --gradient_accumulation_steps=5 --per_device_train_batch_size=6 --per_device_eval_batch_size=8 \
  --augment --num_train_epochs=60 --teacher_guidance_scale=-1 \
  --target_ema_decay=.95 --ema_decay=.999 --learning_rate=1e-5 --adam_weight_decay=1e-4 \
  --use_edm --use_bf16 --checkpointing_steps=best --num_diffusion_steps=18 \
  --num_warmup_steps=750 --snr_gamma 5 --loss_type mse --output_dir saved/stage2

# Stage 3 -- CLAP-score end-to-end fine-tune (stage 2 with the clap loss)
python cli/train.py --stage 2 \
  --train_file=$train_file --validation_file=$validation_file --test_file=$test_file \
  --text_encoder_name=$text_encoder_name --freeze_text_encoder \
  --unet_model_config=$unet_model_config --tango_model=$tango_model --stage1_model=$stage2_model \
  --vae_checkpoint=$vae_checkpoint \
  --gradient_accumulation_steps=15 --per_device_train_batch_size=2 --per_device_eval_batch_size=2 \
  --seed=0 --augment --num_train_epochs=10 --teacher_guidance_scale=-1 \
  --target_ema_decay=.95 --ema_decay=.999 --learning_rate=1e-6 --adam_weight_decay=1e-4 \
  --use_edm --use_bf16 --checkpointing_steps=best --num_diffusion_steps=18 \
  --num_warmup_steps=250 --snr_gamma 5 --loss_type clap --output_dir saved/stage3
