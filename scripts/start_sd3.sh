#!/usr/bin/env bash
# Canonical 4-step SD3 workflow (rebuild of scripts/start_sd3.sh).
set -e
export PYTHONPATH=$(pwd)
PRETRAINED=${PRETRAINED:+--pretrained_model_path $PRETRAINED}
CONTENT=${CONTENT:-examples/contents/demo-fly}
STYLE=${STYLE:-examples/styles/00033.png}
MASK=${MASK:-examples/masks/demo-fly.png}
# Fresh clones carry no example corpus (the reference bundles real clips we
# cannot ship); synthesize the compatible demo corpus on first use.
if [ "$CONTENT" = "examples/contents/demo-fly" ] && [ ! -d "$CONTENT" ]; then
    python scripts/make_examples.py --root examples
fi
NAME=$(basename $CONTENT)
SNAME=$(basename $STYLE .png)

python -m univst_tpu.cli.run_content_inversion_sd3 $PRETRAINED \
    --content_path $CONTENT --output_path results/contents-inv --is_rf_solver
python -m univst_tpu.cli.run_style_inversion_sd3 $PRETRAINED \
    --style_path $STYLE --output_path results/styles-inv --is_rf_solver
python -m univst_tpu.cli.mask_propagation \
    --feature_path results/contents-inv/sd3/$NAME/features/inversion_feature_map_20_block_5_step.pt \
    --backbone sd3 --mask_path $MASK --output_path results/masks
python -m univst_tpu.cli.run_video_style_transfer_sd3 $PRETRAINED \
    --content_inv_path results/contents-inv/sd3/$NAME/inversion \
    --style_inv_path results/styles-inv/sd3/$SNAME/inversion \
    --mask_path results/masks/sd3/$(basename $MASK .png) \
    --output_path results/stylizations
