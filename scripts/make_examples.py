"""Generate synthetic example assets (the reference bundles a real 16-frame
clip + style images + mask under examples/; this environment cannot ship
those, so we synthesize a compatible demo corpus with the same layout)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import os

import numpy as np
from PIL import Image


def main(root: str, frames: int, size: int):
    rng = np.random.default_rng(0)
    content = os.path.join(root, "contents", "demo-fly")
    os.makedirs(content, exist_ok=True)
    base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    obj = rng.integers(100, 255, (size // 4, size // 4, 3), dtype=np.uint8)
    for i in range(frames):
        img = np.roll(base, shift=3 * i, axis=1)
        x0 = size // 8 + (size // 2 * i) // max(frames - 1, 1) // 2
        y0 = size // 3
        img[y0 : y0 + size // 4, x0 : x0 + size // 4] = obj
        Image.fromarray(img).save(os.path.join(content, "%05d.png" % i))
    styles = os.path.join(root, "styles")
    os.makedirs(styles, exist_ok=True)
    for name, seed in (("00033", 1), ("00035", 2), ("00049", 3)):
        sty = rng.integers(0, 255, (size // 8, size // 8, 3), dtype=np.uint8)
        Image.fromarray(sty).resize((size, size), Image.BICUBIC).save(
            os.path.join(styles, f"{name}.png")
        )
    masks = os.path.join(root, "masks")
    os.makedirs(masks, exist_ok=True)
    m = np.zeros((size, size), np.uint8)
    x0, y0 = size // 8, size // 3
    m[y0 : y0 + size // 4, x0 : x0 + size // 4] = 1
    Image.fromarray(m, mode="L").save(os.path.join(masks, "demo-fly.png"))
    print(f"examples written under {root}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="examples")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    a = p.parse_args()
    main(a.root, a.frames, a.size)
