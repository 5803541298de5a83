"""LPIPS module vs a torch oracle on random weights.

The oracle reimplements the published LPIPS formula (Zhang et al. 2018,
richzhang/PerceptualSimilarity: ScalingLayer -> AlexNet trunk taps ->
unit-normalize -> squared diff -> non-negative 1x1 lin head -> spatial
average -> sum) directly in torch on the SAME random state dicts the
converter consumes — validating layout conversion (OIHW->HWIO) and forward
numerics without pretrained weights, the same methodology as
tests/test_raft.py."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from univst_tpu.utils.lpips import (
    _ALEX_CONVS,
    lpips_distance,
    lpips_params_from_torch,
    random_lpips_params,
)


def _random_torch_state_dicts(seed=0):
    g = torch.Generator().manual_seed(seed)
    feat_idx = (0, 3, 6, 8, 10)
    alex = {}
    cin = 3
    for fi, (cout, k, _, _) in zip(feat_idx, _ALEX_CONVS):
        alex[f"features.{fi}.weight"] = torch.randn(cout, cin, k, k, generator=g) * 0.05
        alex[f"features.{fi}.bias"] = torch.randn(cout, generator=g) * 0.01
        cin = cout
    lin = {}
    for i, (cout, _, _, _) in enumerate(_ALEX_CONVS):
        lin[f"lin{i}.model.1.weight"] = torch.randn(1, cout, 1, 1, generator=g).abs() * 0.1
    return alex, lin


def _torch_lpips(alex, lin, a, b):
    """Published-formula oracle on NCHW [-1,1] inputs."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        x = (x - shift) / scale
        out = []
        feat_idx = (0, 3, 6, 8, 10)
        for i, (fi, (_, _, stride, pad)) in enumerate(zip(feat_idx, _ALEX_CONVS)):
            x = F.conv2d(x, alex[f"features.{fi}.weight"],
                         alex[f"features.{fi}.bias"], stride=stride,
                         padding=pad)
            x = F.relu(x)
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return out

    def unit(x):
        return x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    d = 0.0
    for i, (ta, tb) in enumerate(zip(taps(a), taps(b))):
        diff = (unit(ta) - unit(tb)) ** 2
        d = d + F.conv2d(diff, lin[f"lin{i}.model.1.weight"]).mean(dim=(2, 3))[:, 0]
    return d


def test_lpips_matches_torch_oracle():
    alex, lin = _random_torch_state_dicts(0)
    params = lpips_params_from_torch(alex, lin)
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    got = np.asarray(lpips_distance(params, a, b))
    want = _torch_lpips(alex, lin,
                        torch.from_numpy(a.transpose(0, 3, 1, 2)),
                        torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_zero_on_identical_and_positive():
    params = random_lpips_params(0)
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    d_aa = float(np.asarray(lpips_distance(params, a, a))[0])
    d_ab = float(np.asarray(lpips_distance(params, a, b))[0])
    assert abs(d_aa) < 1e-7
    assert d_ab > 0


def test_lin_key_layouts():
    alex, lin = _random_torch_state_dicts(3)
    bare = {k.replace("lin", "").replace(".model.1", ""): v
            for k, v in lin.items()}  # "{i}.weight"
    p1 = lpips_params_from_torch(alex, lin)
    p2 = lpips_params_from_torch(alex, bare)
    for i in range(5):
        np.testing.assert_array_equal(p1[f"lin{i}"]["w"], p2[f"lin{i}"]["w"])
    with pytest.raises(KeyError):
        lpips_params_from_torch(alex, {"bogus": torch.zeros(1)})
