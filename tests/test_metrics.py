"""PSNR/SSIM/latent-MSE metrics + the compare_outputs tool (VERDICT r3 #5)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from univst_tpu.utils.metrics import (
    compare_frame_stacks,
    latent_mse,
    psnr,
    ssim,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_psnr_identity_and_known_value():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (32, 32, 3)).astype(np.float64)
    assert psnr(a, a) == float("inf")
    # uniform +10 offset: mse=100 -> 10*log10(255^2/100) = 28.13 dB
    np.testing.assert_allclose(psnr(a, a + 10.0), 28.1308, atol=1e-3)


def test_ssim_identity_and_noise_ordering():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (48, 48)).astype(np.float64)
    assert ssim(a, a) == pytest.approx(1.0)
    light = ssim(a, a + rng.normal(0, 5, a.shape))
    heavy = ssim(a, a + rng.normal(0, 50, a.shape))
    assert 0 < heavy < light < 1.0


def test_ssim_matches_skimage_reference_formula():
    """Cross-check against torch-computed reference SSIM on a small image
    (Wang et al. windowed formula, 11x11 gaussian sigma=1.5)."""
    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (32, 32)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255)

    # independent dense implementation (full 2-D window, no separability)
    x = np.arange(11, dtype=np.float64) - 5
    g = np.exp(-(x**2) / (2 * 1.5**2))
    g /= g.sum()
    w2 = np.outer(g, g)

    def conv(img):
        out = np.zeros((img.shape[0] - 10, img.shape[1] - 10))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = (img[i : i + 11, j : j + 11] * w2).sum()
        return out

    mx, my = conv(a), conv(b)
    vx = conv(a * a) - mx * mx
    vy = conv(b * b) - my * my
    cxy = conv(a * b) - mx * my
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    want = (((2 * mx * my + c1) * (2 * cxy + c2))
            / ((mx**2 + my**2 + c1) * (vx + vy + c2))).mean()
    np.testing.assert_allclose(ssim(a, b), want, atol=1e-10)


def test_latent_mse_and_shape_guard():
    a = np.ones((2, 4, 4, 4))
    assert latent_mse(a, a * 3) == pytest.approx(4.0)
    with pytest.raises(ValueError):
        latent_mse(a, a[:1])


def test_compare_frame_stacks():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    r = compare_frame_stacks(a, a)
    assert r["psnr_min"] == float("inf") and r["ssim_mean"] == pytest.approx(1.0)
    b = a.copy()
    b[1] = np.clip(b[1].astype(int) + 40, 0, 255).astype(np.uint8)
    r = compare_frame_stacks(a, b)
    assert len(r["psnr_per_frame"]) == 3
    assert r["psnr_per_frame"][1] == r["psnr_min"] < r["psnr_per_frame"][0]


def test_compare_outputs_cli(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(), db.mkdir()
    for i in range(2):
        f = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        Image.fromarray(f).save(da / f"{i:05d}.png")
        Image.fromarray(np.clip(f.astype(int) + 5, 0, 255).astype(np.uint8)).save(
            db / f"{i:05d}.png"
        )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "compare_outputs.py"),
         str(da), str(db), "--json"],
        capture_output=True, text=True, check=True,
    )
    import json

    r = json.loads(out.stdout)
    assert r["psnr_mean"] > 30 and r["ssim_mean"] > 0.5

    # gate failure path
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "compare_outputs.py"),
         str(da), str(db), "--psnr-min", "60"],
        capture_output=True, text=True,
    )
    assert out.returncode == 1 and "GATE FAILED" in out.stderr
