#!/usr/bin/env bash
# Generate the three COCO evaluation image sets from one checkpoint
# (reference: AttnGAN++/gen_evaluation_images_coco.sh — runs the flat 30k set,
# the SOA per-label folders, and the PA per-positional-word folders).
#
# Usage: scripts/gen_evaluation_images_coco.sh CHECKPOINT TEXT_ENCODER CAPTIONS_PICKLE CAPTION_DIR OUT_DIR [MODEL]
set -euo pipefail

CKPT=$1; TEXT_ENC=$2; VOCAB=$3; CAPTION_DIR=$4; OUT=$5; MODEL=${6:-attngan_pp}; shift $(( $# > 6 ? 6 : $# )); EXTRA=("$@")

COMMON=(--checkpoint "$CKPT" --text_encoder "$TEXT_ENC" --captions_pickle "$VOCAB" --model "$MODEL" "${EXTRA[@]}")

python -m tise_tpu.models.generate "${COMMON[@]}" --mode flat \
    --caption_file "$CAPTION_DIR/COCO_RP_captions.pkl" --output_dir "$OUT/generated"

python -m tise_tpu.models.generate "${COMMON[@]}" --mode soa --images_per_caption 3 \
    --caption_file "$CAPTION_DIR/SOA_input_captions.pkl" --output_dir "$OUT/soa_images"

python -m tise_tpu.models.generate "${COMMON[@]}" --mode pa \
    --caption_file "$CAPTION_DIR/PA_input_captions.pkl" --output_dir "$OUT/pa_images"
