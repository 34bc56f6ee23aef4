#!/usr/bin/env bash
# Fetch every pretrained asset the framework consumes into ckpt/.
#
# This environment has no network egress, so the script documents the exact
# assets and is a one-command bootstrap wherever egress exists. Sources match
# the reference's own pointers:
#   * AudioLDM VAE+vocoder: reference audioldm/utils.py:206-215
#   * PANNs Cnn14 (FD/KL/ISc/KID): audioldm_eval/feature_extractors/panns/models.py:245
#   * VGGish (FAD): audioldm_eval/metrics/fad.py:4 (harritaylor/torchvggish)
#   * LAION-CLAP (CLAP score + stage-3 loss): reference README.md:117
#   * ConsistencyTTA / LightweightLDM model zips: reference README.md:59-63
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p ckpt saved

fetch() {  # fetch <url> <dest>
  local url="$1" dest="$2"
  if [ -f "$dest" ]; then echo "have $dest"; return; fi
  echo "fetching $dest"
  curl -L --fail --retry 3 -o "$dest.tmp" "$url" && mv "$dest.tmp" "$dest"
}

# AudioLDM full checkpoint (VAE + HiFi-GAN vocoder weights; ~4.5 GB)
fetch "https://zenodo.org/record/7600541/files/audioldm-s-full?download=1" \
      "ckpt/audioldm-s-full.ckpt"

# PANNs Cnn14 16 kHz classifier (FD / KL / ISc / KID backbone)
fetch "https://zenodo.org/record/3987831/files/Cnn14_16k_mAP%3D0.438.pth" \
      "ckpt/Cnn14_16k_mAP=0.438.pth"

# VGGish (FAD backbone); torch.hub release of harritaylor/torchvggish
fetch "https://github.com/harritaylor/torchvggish/releases/download/v0.1/vggish-10086976.pth" \
      "ckpt/vggish.pth"

# LAION-CLAP music+audioset checkpoint (CLAP score + stage-3 CLAP loss)
fetch "https://huggingface.co/lukewys/laion_clap/resolve/main/music_audioset_epoch_15_esc_90.14.pt" \
      "ckpt/music_audioset_epoch_15_esc_90.14.pt"

# ConsistencyTTA model weights (student, CLAP-finetuned student, teacher)
for name in ConsistencyTTA ConsistencyTTA_CLAPFT LightweightLDM; do
  if [ ! -d "saved/$name" ]; then
    fetch "https://huggingface.co/Bai-YT/ConsistencyTTA/resolve/main/$name.zip" \
          "ckpt/$name.zip"
    unzip -o "ckpt/$name.zip" -d saved/
  else
    echo "have saved/$name"
  fi
done
# the TANGO-style teacher checkpoint referenced by recipes/train.sh
if [ -f "saved/LightweightLDM/pytorch_model_2.bin" ]; then
  ln -sf "../saved/LightweightLDM/pytorch_model_2.bin" \
         "ckpt/LightweightLDM_pytorch_model_2.bin"
fi

echo "all assets present."
