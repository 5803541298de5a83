"""Mask propagation tests on a synthetic moving square (SURVEY.md §4 test
plan): a bright square moves across frames; its features are distinctive, so
the propagated mask must track it."""

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.methods.mask_propagation import (
    MaskPropConfig,
    _propagate_one,
    propagate_masks,
    to_one_hot,
    upsample_and_binarize,
)


def _moving_square_features(f=6, h=16, w=16, c=8, size=4, seed=0):
    """Features: object pixels share one random direction, bg another + noise."""
    rng = np.random.default_rng(seed)
    obj_dir = rng.standard_normal(c)
    bg_dir = rng.standard_normal(c)
    feats = np.zeros((f, h, w, c), np.float32)
    masks = np.zeros((f, h, w), np.int32)
    for i in range(f):
        x0 = 2 + i  # moves right one pixel per frame
        feats[i] = bg_dir + 0.05 * rng.standard_normal((h, w, c))
        feats[i, 5 : 5 + size, x0 : x0 + size] = obj_dir + 0.05 * rng.standard_normal(
            (size, size, c)
        )
        masks[i, 5 : 5 + size, x0 : x0 + size] = 1
    return feats, masks


def test_propagate_one_recovers_translated_mask():
    feats, masks = _moving_square_features()
    cfg = MaskPropConfig(topk=5)
    f0 = jnp.asarray(feats[0].reshape(-1, feats.shape[-1]))
    f1 = jnp.asarray(feats[1].reshape(-1, feats.shape[-1]))
    seg0 = to_one_hot(jnp.asarray(masks[0]), 2)
    segs1 = _propagate_one(f0, seg0, jnp.ones(f0.shape[0], bool), f1, cfg)
    pred = np.asarray(jnp.argmax(segs1, axis=0).reshape(16, 16))
    iou = (pred * masks[1]).sum() / np.maximum((pred | masks[1]).sum(), 1)
    assert iou > 0.8, f"IoU {iou}"


def test_propagate_masks_full_video():
    feats, masks = _moving_square_features()
    f, h, w, c = feats.shape
    cfg = MaskPropConfig(topk=5, n_last_frames=3)
    segs = propagate_masks(
        jnp.asarray(feats.reshape(f, h * w, c)),
        to_one_hot(jnp.asarray(masks[0]), 2),
        cfg,
        key=jax.random.PRNGKey(0),
    )
    assert segs.shape == (f - 1, 2, h * w)
    for i in range(f - 1):
        pred = np.asarray(jnp.argmax(segs[i], axis=0).reshape(h, w))
        gt = masks[i + 1]
        iou = (pred * gt).sum() / np.maximum((pred | gt).sum(), 1)
        assert iou > 0.6, f"frame {i+1} IoU {iou}"


def test_upsample_and_binarize():
    feats, masks = _moving_square_features()
    f, h, w, c = feats.shape
    segs = propagate_masks(
        jnp.asarray(feats.reshape(f, h * w, c)),
        to_one_hot(jnp.asarray(masks[0]), 2),
        MaskPropConfig(topk=5, n_last_frames=3),
    )
    out = np.asarray(upsample_and_binarize(segs, (h, w), (64, 64)))
    assert out.shape == (f - 1, 64, 64)
    assert set(np.unique(out)).issubset({0, 255})
    assert out.sum() > 0  # something was propagated


def test_cli_binary_255_mask_matches_01_mask(tmp_path):
    """A conventional {0,255} binary PNG must propagate identically to the
    {0,1} encoding (and as a 2-class problem, not 256 one-hot planes —
    regression: n_cls was derived from max()+1)."""
    import torch
    from PIL import Image

    from univst_tpu.cli import mask_propagation as mp

    rng = np.random.default_rng(0)
    f, fh, fw, c = 4, 8, 8, 16
    feats = torch.from_numpy(rng.standard_normal((f, fh, fw, c)).astype(np.float32))
    feat_path = tmp_path / "inversion_feature_map_2_block_301_step.pt"
    torch.save(feats, feat_path)

    m = np.zeros((32, 32), np.uint8)
    m[8:20, 10:22] = 1
    Image.fromarray(m, mode="L").save(tmp_path / "m01.png")
    Image.fromarray(m * 255, mode="L").save(tmp_path / "m255.png")

    outs = {}
    for name in ("m01", "m255"):
        mp.main(mp.build_parser().parse_args([
            "--feature_path", str(feat_path), "--backbone", "sd",
            "--mask_path", str(tmp_path / f"{name}.png"),
            "--output_path", str(tmp_path / "out"), "--num_frames", str(f),
            "--platform", "cpu",
        ]))
        frames = [np.asarray(Image.open(tmp_path / "out" / "sd" / name / ("%05d.png" % i)))
                  for i in range(1, f)]  # frame 0 is the input passthrough
        outs[name] = np.stack(frames)
    np.testing.assert_array_equal(outs["m01"], outs["m255"])
    assert set(np.unique(outs["m01"])) <= {0, 255}


def test_davis_palette_and_rendering(tmp_path):
    """davis_palette() reproduces the reference src/palette.txt table
    (spot-checked rows incl. the 191-for-192 DAVIS variant and the
    grayscale tail) and save_palette_mask writes P-mode PNGs whose pixel
    values are the label ids."""
    from PIL import Image

    from univst_tpu.utils.io import davis_palette, save_palette_mask

    pal = davis_palette()
    assert pal.shape == (256, 3)
    expected = {
        0: (0, 0, 0), 1: (128, 0, 0), 2: (0, 128, 0), 8: (64, 0, 0),
        9: (191, 0, 0), 18: (0, 191, 0), 21: (128, 64, 128),
        22: (22, 22, 22), 255: (255, 255, 255),
    }
    for idx, rgb in expected.items():
        assert tuple(pal[idx]) == rgb, idx

    labels = np.zeros((8, 8), np.uint8)
    labels[2:5, 3:6] = 1
    p = tmp_path / "lab.png"
    save_palette_mask(labels, str(p))
    img = Image.open(p)
    assert img.mode == "P"
    np.testing.assert_array_equal(np.asarray(img), labels)
    assert img.getpalette()[3:6] == [128, 0, 0]
