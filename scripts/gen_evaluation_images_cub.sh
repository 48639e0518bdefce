#!/usr/bin/env bash
# Generate the CUB evaluation image set (reference:
# AttnGAN++/gen_evaluation_images_cub.sh / CounterModel variant — a single
# flat set named by caption id, consumed by IS*/FID/RP-CUB).
#
# Usage: scripts/gen_evaluation_images_cub.sh CHECKPOINT TEXT_ENCODER CAPTIONS_PICKLE CAPTION_FILE OUT_DIR [MODEL]
set -euo pipefail

CKPT=$1; TEXT_ENC=$2; VOCAB=$3; CAPTIONS=$4; OUT=$5; MODEL=${6:-attngan_pp}; shift $(( $# > 6 ? 6 : $# )); EXTRA=("$@")

python -m tise_tpu.models.generate --mode flat \
    --checkpoint "$CKPT" --text_encoder "$TEXT_ENC" --captions_pickle "$VOCAB" \
    --model "$MODEL" --caption_file "$CAPTIONS" --output_dir "$OUT/generated" "${EXTRA[@]}"
