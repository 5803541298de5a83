"""Style inversion CLI, AnimateDiff backbone
(rebuild of src/animatediff/run_style_inversion_animatediff.py)."""

from univst_tpu.cli import run_style_inversion_sd as _sd


def build_parser():
    p = _sd.build_parser()
    p.set_defaults(backbone="animatediff")
    p.add_argument("--motion_module_path", type=str, default=None)
    p.add_argument("--dreambooth_path", type=str, default=None)
    p.add_argument("--lora_path", type=str, default=None)
    p.add_argument("--lora_alpha", type=float, default=0.8)
    return p


main = _sd.main

if __name__ == "__main__":
    main(build_parser().parse_args())
