"""Smoke/unit coverage for the standalone tool modules: the optical-flow CLI
(rebuild of src/cal_optica_flow.py __main__), the jaxpr FLOP counter that
feeds the bench's MFU metric, and the profiling helpers."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_cal_optical_flow_cli(tmp_path):
    """End-to-end: a known translation between two frames -> occlusion mask
    and warped image written; the warp recovers most of image2."""
    from PIL import Image

    from univst_tpu.cli import cal_optical_flow as cof

    rng = np.random.default_rng(0)
    # band-limited random image (LK needs informative gradients) shifted 2px
    low = rng.standard_normal((8, 8, 3)).astype(np.float32)
    base = np.asarray(jax.image.resize(jnp.asarray(low), (64, 64, 3), "bicubic"))
    base = (base - base.min()) / (base.max() - base.min())
    img1 = (base * 255).astype(np.uint8)
    img2 = np.roll(img1, -2, axis=1)
    Image.fromarray(img1).save(tmp_path / "a.png")
    Image.fromarray(img2).save(tmp_path / "b.png")

    occ_p = tmp_path / "occ.png"
    warp_p = tmp_path / "warp.png"
    cof.main(cof.build_parser().parse_args([
        "--image1", str(tmp_path / "a.png"), "--image2", str(tmp_path / "b.png"),
        "--occlusion_mask_save_path", str(occ_p),
        "--warped_image_save_path", str(warp_p), "--platform", "cpu",
    ]))
    occ = np.asarray(Image.open(occ_p))
    warped = np.asarray(Image.open(warp_p)).astype(np.float32)
    assert set(np.unique(occ)) <= {0, 255}
    # get_warp brings image2 onto FRAME-1 geometry (cal_optica_flow.py:51-99):
    # the output approximates image1 away from the wrap boundary
    f1 = img1.astype(np.float32)
    err = np.abs(warped[8:-8, 8:-8] - f1[8:-8, 8:-8]).mean()
    base_err = np.abs(img2.astype(np.float32)[8:-8, 8:-8] - f1[8:-8, 8:-8]).mean()
    assert err < 0.5 * base_err, (err, base_err)


def test_count_matmul_flops_known_shapes():
    from univst_tpu.utils.flops import count_matmul_flops

    a = jnp.zeros((8, 16), jnp.float32)
    b = jnp.zeros((16, 32), jnp.float32)
    # one [8,16]x[16,32] matmul = 2*8*16*32 FLOPs
    assert count_matmul_flops(lambda x, y: x @ y, a, b) == 2 * 8 * 16 * 32
    # scan multiplies by the trip count
    def scanned(x, y):
        def body(c, _):
            return c, x @ y
        _, ys = jax.lax.scan(body, 0.0, None, length=5)
        return ys
    assert count_matmul_flops(scanned, a, b) == 5 * 2 * 8 * 16 * 32
    # conv: NHWC 3x3 -> 2 * N*H*W*Cout * (9*Cin)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    w = jnp.zeros((3, 3, 4, 16), jnp.float32)
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert count_matmul_flops(conv, x, w) == 2 * 1 * 8 * 8 * 16 * 9 * 4


def test_phase_timer_and_sync():
    from univst_tpu.utils.profiling import PhaseTimer, sync

    t = PhaseTimer()
    with t.phase("a"):
        sync(jnp.ones((4, 4)) * 2)
    rep = t.report()
    assert "a" in rep
