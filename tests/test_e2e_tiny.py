"""End-to-end 4-step workflow smoke test on the tiny SD variant (CPU):
content inversion -> style inversion -> mask propagation -> localized style
transfer, exercising the reference CLI surface and on-disk hand-off formats
(scripts/start_sd.sh workflow)."""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # model-level; run fast set with -m 'not slow'

FRAMES, SIZE, STEPS = 4, 64, 10


@pytest.fixture(scope="module")
def example_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    content_dir = root / "contents" / "vid"
    content_dir.mkdir(parents=True)
    base = rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
    for i in range(FRAMES):
        img = np.roll(base, shift=i * 2, axis=1)
        img[20:36, 10 + 4 * i : 26 + 4 * i] = [250, 60, 40]  # moving object
        Image.fromarray(img).save(content_dir / ("%05d.png" % i))
    style = rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
    Image.fromarray(style).save(root / "style.png")
    mask = np.zeros((SIZE, SIZE), np.uint8)
    mask[20:36, 10:26] = 1
    Image.fromarray(mask, mode="L").save(root / "mask.png")
    return root


def test_full_workflow(example_data):
    root = example_data
    out = root / "results"

    from univst_tpu.cli import run_content_inversion_sd as ci
    from univst_tpu.cli import run_style_inversion_sd as si
    from univst_tpu.cli import mask_propagation as mp
    from univst_tpu.cli import run_video_style_transfer_sd as st

    common = [
        "--variant", "tiny", "--num_frames", str(FRAMES), "--height", str(SIZE),
        "--width", str(SIZE), "--time_steps", str(STEPS), "--platform", "cpu",
    ]
    # step 1: content inversion (ft_timesteps=301 is in the 10-step schedule)
    ci.main(ci.build_parser().parse_args(common + [
        "--content_path", str(root / "contents" / "vid"),
        "--output_path", str(out / "contents-inv"),
        "--ft_timesteps", "301", "--is_opt",
    ]))
    inv_dir = out / "contents-inv" / "sd" / "vid"
    assert (inv_dir / "inversion" / f"ddim_latents_{STEPS}.pt").exists()
    assert (inv_dir / "inversion" / "ddim_latents_0.pt").exists()
    feat_path = inv_dir / "features" / "inversion_feature_map_2_block_301_step.pt"
    assert feat_path.exists()

    # step 2: style inversion
    si.main(si.build_parser().parse_args(common + [
        "--style_path", str(root / "style.png"),
        "--output_path", str(out / "styles-inv"),
    ]))
    assert (out / "styles-inv" / "sd" / "style" / "inversion" /
            f"ddim_latents_{STEPS}.pt").exists()

    # step 3: mask propagation
    mp.main(mp.build_parser().parse_args([
        "--feature_path", str(feat_path),
        "--backbone", "sd",
        "--mask_path", str(root / "mask.png"),
        "--output_path", str(out / "masks"),
        "--num_frames", str(FRAMES),
        "--platform", "cpu",
    ]))
    mask_dir = out / "masks" / "sd" / "mask"
    for i in range(FRAMES):
        assert (mask_dir / ("%05d.png" % i)).exists()
    # palette-rendered labels (reference palette.txt's intended rendering)
    pal = Image.open(mask_dir / "palette" / "00001.png")
    assert pal.mode == "P" and pal.getpalette()[3:6] == [128, 0, 0]

    # step 4: localized style transfer
    st.main(st.build_parser().parse_args(common + [
        "--content_inv_path", str(inv_dir / "inversion"),
        "--style_inv_path", str(out / "styles-inv" / "sd" / "style" / "inversion"),
        "--mask_path", str(mask_dir),
        "--output_path", str(out / "stylizations"),
    ]))
    styl_dir = out / "stylizations" / "sd" / "vid_style"
    frames = sorted(os.listdir(styl_dir))
    assert len(frames) == FRAMES
    img = np.asarray(Image.open(styl_dir / frames[0]))
    assert img.shape == (SIZE, SIZE, 3)
    assert img.std() > 0  # not a constant image


def test_animatediff_workflow(example_data):
    """AD CLI path: content inversion -> style transfer (no init AdaIN,
    linear-beta DDIM, no cross-frame attention)."""
    root = example_data
    out = root / "results_ad"
    from univst_tpu.cli import run_content_inversion_animatediff as ci
    from univst_tpu.cli import run_style_inversion_animatediff as si
    from univst_tpu.cli import run_video_style_transfer_animatediff as st

    common = [
        "--variant", "tiny", "--num_frames", str(FRAMES), "--height", str(SIZE),
        "--width", str(SIZE), "--time_steps", "4", "--platform", "cpu",
    ]
    ci.main(ci.build_parser().parse_args(common + [
        "--content_path", str(root / "contents" / "vid"),
        "--output_path", str(out / "ci"), "--ft_timesteps", "501",
    ]))
    si.main(si.build_parser().parse_args(common + [
        "--style_path", str(root / "style.png"), "--output_path", str(out / "si"),
    ]))
    st.main(st.build_parser().parse_args(common + [
        "--content_inv_path", str(out / "ci" / "animatediff" / "vid" / "inversion"),
        "--style_inv_path", str(out / "si" / "animatediff" / "style" / "inversion"),
        "--output_path", str(out / "st"),
    ]))
    frames = sorted(os.listdir(out / "st" / "animatediff" / "vid_style"))
    assert len(frames) == FRAMES


def test_sd3_workflow(example_data):
    """SD3 CLI path: RF-Solver inversion -> controlled-velocity stylization,
    SD3 trajectory format [F, C, H, W]."""
    root = example_data
    out = root / "results_sd3"
    from univst_tpu.cli import run_content_inversion_sd3 as ci
    from univst_tpu.cli import run_style_inversion_sd3 as si
    from univst_tpu.cli import run_video_style_transfer_sd3 as st

    common = [
        "--variant", "tiny", "--num_frames", str(FRAMES), "--height", str(SIZE),
        "--width", str(SIZE), "--time_steps", "4", "--platform", "cpu",
    ]
    ci.main(ci.build_parser().parse_args(common + [
        "--content_path", str(root / "contents" / "vid"),
        "--output_path", str(out / "ci"), "--ft_indices", "1",
        "--ft_timesteps", "1", "--is_rf_solver",
    ]))
    import torch

    lat = torch.load(out / "ci" / "sd3" / "vid" / "inversion" / "ddim_latents_4.pt",
                     weights_only=True)
    assert lat.ndim == 4  # [F, C, H, W]
    si.main(si.build_parser().parse_args(common + [
        "--style_path", str(root / "style.png"), "--output_path", str(out / "si"),
    ]))
    st.main(st.build_parser().parse_args(common + [
        "--content_inv_path", str(out / "ci" / "sd3" / "vid" / "inversion"),
        "--style_inv_path", str(out / "si" / "sd3" / "style" / "inversion"),
        "--output_path", str(out / "st"),
    ]))
    frames = sorted(os.listdir(out / "st" / "sd3" / "vid_style"))
    assert len(frames) == FRAMES


def test_one_process_workflow_runner(example_data):
    """run_workflow drives all four stages in one process and reproduces the
    per-stage CLI output tree (cold-start feature: one backend init instead
    of four through the remote-TPU relay)."""
    root = example_data
    out = root / "results_wf"

    from univst_tpu.cli import run_workflow as wf

    wf.main(wf.build_parser().parse_args([
        "--backbone", "sd", "--variant", "tiny",
        "--num_frames", str(FRAMES), "--height", str(SIZE),
        "--width", str(SIZE), "--time_steps", str(STEPS),
        "--platform", "cpu",
        "--content_path", str(root / "contents" / "vid"),
        "--style_path", str(root / "style.png"),
        "--mask_path", str(root / "mask.png"),
        "--output_root", str(out),
    ]))
    assert (out / "contents-inv" / "sd" / "vid" / "inversion" /
            f"ddim_latents_{STEPS}.pt").exists()
    assert (out / "styles-inv" / "sd" / "style" / "inversion" /
            f"ddim_latents_{STEPS}.pt").exists()
    for i in range(FRAMES):
        assert (out / "masks" / "sd" / "mask" / ("%05d.png" % i)).exists()
    styl_dir = out / "stylizations" / "sd" / "vid_style"
    frames = sorted(os.listdir(styl_dir))
    assert len(frames) == FRAMES
    img = np.asarray(Image.open(styl_dir / frames[0]))
    assert img.shape == (SIZE, SIZE, 3)
    assert img.std() > 0


def test_workflow_runner_cpu_mesh(example_data):
    """CPU-mesh CLI invocation end-to-end: the full 4-stage workflow with
    --mesh data=4 on the 8-virtual-device CPU mesh (conftest), one frame per
    shard — the user-reachable multi-chip path, not just the dryrun."""
    root = example_data
    out = root / "results_mesh"

    from univst_tpu.cli import run_workflow as wf

    wf.main(wf.build_parser().parse_args([
        "--backbone", "sd", "--variant", "tiny",
        "--num_frames", str(FRAMES), "--height", str(SIZE),
        "--width", str(SIZE), "--time_steps", str(STEPS),
        "--platform", "cpu", "--mesh", "data=4",
        "--content_path", str(root / "contents" / "vid"),
        "--style_path", str(root / "style.png"),
        "--mask_path", str(root / "mask.png"),
        "--output_root", str(out),
    ]))
    styl_dir = out / "stylizations" / "sd" / "vid_style"
    frames = sorted(os.listdir(styl_dir))
    assert len(frames) == FRAMES
    img = np.asarray(Image.open(styl_dir / frames[0]))
    assert img.shape == (SIZE, SIZE, 3)
    assert img.std() > 0
