"""Generate the synthetic example corpus (the reference bundles a real
16-frame DAVIS clip + style images + first-frame mask under ``examples/`` —
`/root/reference/examples/contents/mallard-fly/*`, `examples/styles/*`,
`examples/masks/mallard-fly.png`; this environment cannot ship those, so we
synthesize a compatible demo corpus with the same layout).

The corpus is COMMITTED to the repo (the reference's is too) and doubles as
the cross-clone regression anchor: every op below is integer arithmetic on a
seeded ``np.random.default_rng`` stream, so regeneration is bitwise
deterministic on any platform — ``tests/test_goldens.py`` asserts the
committed PNGs decode to exactly what this script produces. Content frames
are box-blurred noise (natural-image-like spectrum, PNG-compressible) with a
textured object translating left-to-right; the first-frame mask covers the
object at frame 0, matching the reference's mask/clip pairing.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import os

import numpy as np
from PIL import Image


def _box_blur(img: np.ndarray, radius: int, passes: int = 2) -> np.ndarray:
    """Integer box blur (uint8 in/out, exact // arithmetic — bitwise
    deterministic everywhere, unlike float FFT/resize filters)."""
    out = img.astype(np.uint32)
    w = 2 * radius + 1
    for _ in range(passes):
        for axis in (0, 1):
            acc = np.zeros_like(out)
            for s in range(-radius, radius + 1):
                acc += np.roll(out, s, axis=axis)
            out = acc // w
    return out.astype(np.uint8)


def _object_sprite(rng: np.random.Generator, size: int) -> np.ndarray:
    """A textured warm-colored square sprite, blurred so it compresses."""
    spr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    spr = _box_blur(spr, radius=2, passes=1)
    # push toward warm tones so the object is visually distinct
    spr[..., 0] = np.minimum(255, spr[..., 0].astype(np.uint32) + 120).astype(np.uint8)
    spr[..., 2] //= 2
    return spr


def _style_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """Coarse blurred color patches — a painterly stand-in for a style
    reference (integer upsample by pixel repetition, then box blur)."""
    cells = 8
    coarse = rng.integers(0, 255, (cells, cells, 3), dtype=np.uint8)
    rep = size // cells
    img = np.repeat(np.repeat(coarse, rep, axis=0), rep, axis=1)
    return _box_blur(img, radius=max(2, rep // 4), passes=2)


def write_corpus(root: str, frames: int, size: int, name: str = "demo-fly",
                 styles=("00033", "00035", "00049")) -> None:
    rng = np.random.default_rng(0)
    content = os.path.join(root, "contents", name)
    os.makedirs(content, exist_ok=True)
    base = _box_blur(
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8),
        radius=max(1, size // 64), passes=2,
    )
    obj = _object_sprite(rng, size // 4)
    xs, y0 = [], size // 3
    for i in range(frames):
        img = np.roll(base, shift=3 * i * max(1, size // 512), axis=1)
        x0 = size // 8 + (size // 2) * i // max(frames - 1, 1) // 2
        img[y0: y0 + size // 4, x0: x0 + size // 4] = obj
        xs.append(x0)
        Image.fromarray(img).save(os.path.join(content, "%05d.png" % i))
    styles_dir = os.path.join(root, "styles")
    os.makedirs(styles_dir, exist_ok=True)
    for j, sname in enumerate(styles):
        sty = _style_image(np.random.default_rng(j + 1), size)
        Image.fromarray(sty).save(os.path.join(styles_dir, f"{sname}.png"))
    masks = os.path.join(root, "masks")
    os.makedirs(masks, exist_ok=True)
    m = np.zeros((size, size), np.uint8)
    m[y0: y0 + size // 4, xs[0]: xs[0] + size // 4] = 1
    Image.fromarray(m, mode="L").save(os.path.join(masks, f"{name}.png"))


def main(root: str, frames: int, size: int, tiny: bool = True):
    write_corpus(root, frames, size, name="demo-fly")
    if tiny:
        # the CI/golden corpus: 4 frames at 64px, natively generated (no
        # float resize in the loop) — tests/test_goldens.py pins the tiny
        # pipeline's mask-propagation outputs on exactly these files
        write_corpus(root, frames=4, size=64, name="demo-fly-tiny",
                     styles=("tiny-00033",))
    print(f"examples written under {root}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="examples")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    a = p.parse_args()
    main(a.root, a.frames, a.size)
