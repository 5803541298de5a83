"""Weights-day fire drill, layer 2: CLIs against synthetic checkpoint DIRS.

Layer 1 (tests/test_synth_ckpt.py) proves converter <-> generator key/
transform agreement in memory. This layer materializes checkpoint
*directories* with the released file layouts (diffusers
``unet/vae/transformer/diffusion_pytorch_model.safetensors``, transformers
``text_encoder*/model.safetensors``, the AnimateDiff ``mm.ckpt`` torch
pickle) and drives the real CLI entry points with
``--pretrained_model_path`` pointed at them — the exact code path
weights-day will take (reference loads the same layouts via
``from_pretrained``, src/sd/run_content_inversion_sd.py:39-43, and
``load_weights``, animatediff/utils/util.py:89-121). Any key-name or
layout drift fails the load loudly (strict converters, VERDICT r3 #4).
"""

import importlib.util
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

FRAMES, SIZE, STEPS = 4, 64, 4

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "make_synthetic_checkpoints.py")


def _load_script():
    spec = importlib.util.spec_from_file_location("make_synth_ckpt", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_ckpt")
    msc = _load_script()
    msc.make_sd(str(root / "sd"), "tiny", FRAMES, SIZE)
    msc.make_ad(str(root / "ad"), "tiny", FRAMES, SIZE)
    msc.make_sd3(str(root / "sd3"), "tiny", FRAMES, SIZE)
    return root


@pytest.fixture(scope="module")
def video_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("fire_drill_data")
    rng = np.random.default_rng(0)
    content_dir = root / "contents" / "vid"
    content_dir.mkdir(parents=True)
    for i in range(FRAMES):
        img = rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
        Image.fromarray(img).save(content_dir / ("%05d.png" % i))
    return root


def _common(extra=()):
    return [
        "--variant", "tiny", "--num_frames", str(FRAMES), "--height",
        str(SIZE), "--width", str(SIZE), "--time_steps", str(STEPS),
        "--platform", "cpu", *extra,
    ]


def test_sd_values_transported_through_build(ckpt_root):
    """The CLI build path must install the checkpoint's values, not just
    tolerate its keys: conv_in.weight from the safetensors file must land
    (layout-transformed) in the pipeline's param tree."""
    from safetensors.numpy import load_file

    import jax.numpy as jnp

    from univst_tpu.pipelines.sd import SDVideoPipeline

    pipe = SDVideoPipeline.build(
        pretrained_model_path=str(ckpt_root / "sd"), variant="tiny",
        num_frames=FRAMES, height=SIZE, width=SIZE, dtype=jnp.float32,
    )
    sd = load_file(ckpt_root / "sd" / "unet" / "diffusion_pytorch_model.safetensors")
    want = np.transpose(sd["conv_in.weight"], (2, 3, 1, 0))  # torch->flax conv
    got = np.asarray(pipe.unet_params["conv_in"]["spatial"]["kernel"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)
    vae = load_file(ckpt_root / "sd" / "vae" / "diffusion_pytorch_model.safetensors")
    want = np.transpose(vae["encoder.conv_in.weight"], (2, 3, 1, 0))
    got = np.asarray(pipe.vae_params["encoder"]["conv_in"]["kernel"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sd_cli_loads_synth_checkpoint(ckpt_root, video_data):
    from univst_tpu.cli import run_content_inversion_sd as ci

    out = video_data / "out_sd"
    ci.main(ci.build_parser().parse_args(_common([
        "--pretrained_model_path", str(ckpt_root / "sd"),
        "--content_path", str(video_data / "contents" / "vid"),
        "--output_path", str(out),
    ])))
    assert (out / "sd" / "vid" / "inversion" / f"ddim_latents_{STEPS}.pt").exists()


def test_ad_cli_loads_synth_checkpoint_and_motion(ckpt_root, video_data):
    from univst_tpu.cli import run_content_inversion_animatediff as ci

    out = video_data / "out_ad"
    ci.main(ci.build_parser().parse_args(_common([
        "--pretrained_model_path", str(ckpt_root / "ad"),
        "--motion_module_path", str(ckpt_root / "ad" / "mm.ckpt"),
        "--content_path", str(video_data / "contents" / "vid"),
        "--output_path", str(out),
    ])))
    assert (out / "animatediff" / "vid" / "inversion" /
            f"ddim_latents_{STEPS}.pt").exists()


def test_sd3_cli_loads_synth_checkpoint(ckpt_root, video_data):
    from univst_tpu.cli import run_content_inversion_sd3 as ci

    out = video_data / "out_sd3"
    ci.main(ci.build_parser().parse_args(_common([
        "--pretrained_model_path", str(ckpt_root / "sd3"),
        "--content_path", str(video_data / "contents" / "vid"),
        "--output_path", str(out),
        "--ft_indices", "1", "--ft_timesteps", "1",  # tiny has 2 blocks
    ])))
    assert (out / "sd3" / "vid" / "inversion" /
            f"ddim_latents_{STEPS}.pt").exists()


def test_key_name_drift_fails_loudly(ckpt_root, tmp_path):
    """Rename one checkpoint key -> the strict converter must raise (one
    missing + one unconsumed), never silently keep the random init."""
    from safetensors.numpy import load_file, save_file

    import jax.numpy as jnp

    from univst_tpu.pipelines.sd import SDVideoPipeline

    drift = tmp_path / "drifted"
    (drift / "unet").mkdir(parents=True)
    sd = dict(load_file(
        ckpt_root / "sd" / "unet" / "diffusion_pytorch_model.safetensors"))
    sd["conv_in.weight_RENAMED"] = sd.pop("conv_in.weight")
    save_file(sd, drift / "unet" / "diffusion_pytorch_model.safetensors")
    with pytest.raises((KeyError, ValueError)):
        SDVideoPipeline.build(
            pretrained_model_path=str(drift), variant="tiny",
            num_frames=FRAMES, height=SIZE, width=SIZE, dtype=jnp.float32,
        )
