#!/usr/bin/env bash
# Canonical 4-step AnimateDiff workflow (rebuild of scripts/start_animatediff.sh).
set -e
export PYTHONPATH=$(pwd)
PRETRAINED=${PRETRAINED:+--pretrained_model_path $PRETRAINED}
MM=${MOTION_MODULE:+--motion_module_path $MOTION_MODULE}
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

python -m univst_tpu.cli.run_content_inversion_animatediff $PRETRAINED $MM \
    --content_path $CONTENT --output_path results/contents-inv --is_opt
python -m univst_tpu.cli.run_style_inversion_animatediff $PRETRAINED $MM \
    --style_path $STYLE --output_path results/styles-inv
python -m univst_tpu.cli.mask_propagation \
    --feature_path results/contents-inv/animatediff/$NAME/features/inversion_feature_map_2_block_301_step.pt \
    --backbone animatediff --mask_path $MASK --output_path results/masks
python -m univst_tpu.cli.run_video_style_transfer_animatediff $PRETRAINED $MM \
    --content_inv_path results/contents-inv/animatediff/$NAME/inversion \
    --style_inv_path results/styles-inv/animatediff/$SNAME/inversion \
    --mask_path results/masks/animatediff/$(basename $MASK .png) \
    --output_path results/stylizations
