"""RAFT structural tests: shapes, iterative refinement, converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univst_tpu.models.convert import convert_raft, merge_into_params
from univst_tpu.models.raft import RAFT, RAFTConfig, make_raft_flow

pytestmark = pytest.mark.slow  # model-level; run fast set with -m 'not slow'


@pytest.fixture(scope="module")
def tiny_raft():
    cfg = RAFTConfig.tiny()
    model = RAFT(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, img)
    return cfg, model, params


def test_flow_shape_and_flow_fn(tiny_raft):
    cfg, model, params = tiny_raft
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    i2 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    flow = model.apply(params, i1, i2)
    assert flow.shape == (1, 64, 64, 2)
    fn = make_raft_flow(params["params"], cfg)
    f = fn(i1[0], i2[0])
    assert f.shape == (64, 64, 2)
    assert not np.isnan(np.asarray(f)).any()


def test_converter_maps_princeton_layout(tiny_raft):
    cfg, model, params = tiny_raft
    rng = np.random.default_rng(1)
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[name + ".weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((cout,)).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((c,)).astype(np.float32)
        sd[name + ".running_mean"] = rng.standard_normal((c,)).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        sd[name + ".num_batches_tracked"] = np.asarray(1)

    d = cfg.encoder_dims
    hid, ctx, out = cfg.hidden_dim, cfg.context_dim, cfg.encoder_out

    def encoder(prefix, out_ch, norm):
        conv(prefix + ".conv1", 3, d[0], 7)
        if norm == "batch":
            bn(prefix + ".norm1", d[0])
        cin = d[0]
        for stage, ch in ((1, d[1]), (2, d[2]), (3, d[3])):
            for blk in (0, 1):
                s = f"{prefix}.layer{stage}.{blk}"
                conv(s + ".conv1", cin if blk == 0 else ch, ch)
                conv(s + ".conv2", ch, ch)
                if norm == "batch":
                    bn(s + ".norm1", ch)
                    bn(s + ".norm2", ch)
                if blk == 0 and (stage > 1 or cin != ch):
                    conv(s + ".downsample.0", cin, ch, 1)
                    if norm == "batch":
                        bn(s + ".downsample.1", ch)
                cin = ch
        conv(prefix + ".conv2", d[3], out_ch, 1)

    encoder("module.fnet", out, "instance")
    encoder("module.cnet", hid + ctx, "batch")
    corr_feat = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    conv("module.update_block.encoder.convc1", corr_feat, 256, 1)
    conv("module.update_block.encoder.convc2", 256, 192)
    conv("module.update_block.encoder.convf1", 2, 128, 7)
    conv("module.update_block.encoder.convf2", 128, 64)
    conv("module.update_block.encoder.conv", 256, 126)
    for name, kk in (("convz1", (1, 5)), ("convr1", (1, 5)), ("convq1", (1, 5)),
                     ("convz2", (5, 1)), ("convr2", (5, 1)), ("convq2", (5, 1))):
        cin = hid + (ctx + 128) if name.endswith("1") else hid + (ctx + 128)
        sd[f"module.update_block.gru.{name}.weight"] = rng.standard_normal(
            (hid, hid + ctx + 128, *kk)
        ).astype(np.float32)
        sd[f"module.update_block.gru.{name}.bias"] = rng.standard_normal(
            (hid,)
        ).astype(np.float32)
    conv("module.update_block.flow_head.conv1", hid, 256)
    conv("module.update_block.flow_head.conv2", 256, 2)
    conv("module.update_block.mask.0", hid, 256)
    conv("module.update_block.mask.2", 256, 64 * 9, 1)

    converted = convert_raft(sd)
    merged = merge_into_params(params["params"], converted)
    np.testing.assert_allclose(
        np.asarray(merged["fnet"]["conv1"]["kernel"]),
        np.transpose(sd["module.fnet.conv1.weight"], (2, 3, 1, 0)),
    )
    # folded BN: scale = w / sqrt(var + eps)
    w = sd["module.cnet.norm1.weight"]
    var = sd["module.cnet.norm1.running_var"]
    np.testing.assert_allclose(
        np.asarray(merged["cnet"]["norm1"]["scale"]), w / np.sqrt(var + 1e-5),
        rtol=1e-6,
    )
    # merged model runs
    i = jnp.zeros((1, 64, 64, 3), jnp.float32)
    flow = RAFT(cfg).apply({"params": merged}, i, i)
    assert flow.shape == (1, 64, 64, 2)


def test_converter_maps_torchvision_layout(tiny_raft):
    """torchvision Raft_Large_Weights layout (what the reference smoother
    loads, src/cal_optica_flow.py:53-54) converts to the same tree as the
    princeton layout with the same values."""
    cfg, model, params = tiny_raft
    # reuse the princeton synthetic dict by renaming it into torchvision form
    import tests.test_raft as _self  # noqa: F401

    rng = np.random.default_rng(1)
    # rebuild the same princeton sd as test_converter_maps_princeton_layout
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[name + ".weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((cout,)).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((c,)).astype(np.float32)
        sd[name + ".running_mean"] = rng.standard_normal((c,)).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        sd[name + ".num_batches_tracked"] = np.asarray(1)

    d = cfg.encoder_dims
    hid, ctx, out = cfg.hidden_dim, cfg.context_dim, cfg.encoder_out

    def encoder(prefix, out_ch, norm):
        conv(prefix + ".conv1", 3, d[0], 7)
        if norm == "batch":
            bn(prefix + ".norm1", d[0])
        cin = d[0]
        for stage, ch in ((1, d[1]), (2, d[2]), (3, d[3])):
            for blk in (0, 1):
                s = f"{prefix}.layer{stage}.{blk}"
                conv(s + ".conv1", cin if blk == 0 else ch, ch)
                conv(s + ".conv2", ch, ch)
                if norm == "batch":
                    bn(s + ".norm1", ch)
                    bn(s + ".norm2", ch)
                if blk == 0 and (stage > 1 or cin != ch):
                    conv(s + ".downsample.0", cin, ch, 1)
                    if norm == "batch":
                        bn(s + ".downsample.1", ch)
                cin = ch
        conv(prefix + ".conv2", d[3], out_ch, 1)

    encoder("fnet", out, "instance")
    encoder("cnet", hid + ctx, "batch")
    corr_feat = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    conv("update_block.encoder.convc1", corr_feat, 256, 1)
    conv("update_block.encoder.convc2", 256, 192)
    conv("update_block.encoder.convf1", 2, 128, 7)
    conv("update_block.encoder.convf2", 128, 64)
    conv("update_block.encoder.conv", 256, 126)
    for name, kk in (("convz1", (1, 5)), ("convr1", (1, 5)), ("convq1", (1, 5)),
                     ("convz2", (5, 1)), ("convr2", (5, 1)), ("convq2", (5, 1))):
        sd[f"update_block.gru.{name}.weight"] = rng.standard_normal(
            (hid, hid + ctx + 128, *kk)
        ).astype(np.float32)
        sd[f"update_block.gru.{name}.bias"] = rng.standard_normal(
            (hid,)
        ).astype(np.float32)
    conv("update_block.flow_head.conv1", hid, 256)
    conv("update_block.flow_head.conv2", 256, 2)
    conv("update_block.mask.0", hid, 256)
    conv("update_block.mask.2", 256, 64 * 9, 1)

    # princeton -> torchvision key rename (the inverse of the converter's map)
    def tv_name(k):
        stem, _, leaf = k.rpartition(".")
        gru_map = {"convz1": ("convgru1", "convz"), "convr1": ("convgru1", "convr"),
                   "convq1": ("convgru1", "convq"), "convz2": ("convgru2", "convz"),
                   "convr2": ("convgru2", "convr"), "convq2": ("convgru2", "convq")}
        for enc_src, enc_dst in (("fnet", "feature_encoder"), ("cnet", "context_encoder")):
            if stem == f"{enc_src}.conv1":
                return f"{enc_dst}.convnormrelu.0.{leaf}"
            if stem == f"{enc_src}.norm1":
                return f"{enc_dst}.convnormrelu.1.{leaf}"
            if stem == f"{enc_src}.conv2":
                return f"{enc_dst}.conv.{leaf}"
            if stem.startswith(f"{enc_src}.layer"):
                rest = stem[len(enc_src) + 1:]  # layerS.B.xxx
                parts = rest.split(".")
                layer, blk, mod = parts[0], parts[1], ".".join(parts[2:])
                mod_map = {"conv1": "convnormrelu1.0", "norm1": "convnormrelu1.1",
                           "conv2": "convnormrelu2.0", "norm2": "convnormrelu2.1",
                           "downsample.0": "downsample.0", "downsample.1": "downsample.1"}
                return f"{enc_dst}.{layer}.{blk}.{mod_map[mod]}.{leaf}"
        if stem.startswith("update_block.encoder."):
            name = stem.split(".")[-1]
            me_map = {"convc1": "convcorr1.0", "convc2": "convcorr2.0",
                      "convf1": "convflow1.0", "convf2": "convflow2.0",
                      "conv": "conv.0"}
            return f"update_block.motion_encoder.{me_map[name]}.{leaf}"
        if stem.startswith("update_block.gru."):
            g, gate = gru_map[stem.split(".")[-1]]
            return f"update_block.recurrent_block.{g}.{gate}.{leaf}"
        if stem == "update_block.mask.0":
            return f"mask_predictor.convrelu.0.{leaf}"
        if stem == "update_block.mask.2":
            return f"mask_predictor.conv.{leaf}"
        return k  # flow_head unchanged

    tv_sd = {tv_name(k): v for k, v in sd.items()}
    assert len(tv_sd) == len(sd)
    assert any(k.startswith("feature_encoder.") for k in tv_sd)

    want = convert_raft(sd)
    got = convert_raft(tv_sd)
    import jax

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_corr_lookup_channel_order_matches_princeton():
    """Formula-verbatim oracle for the (2r+1)^2 correlation-window channel
    enumeration. princeton-vl/torchvision CorrBlock builds
    ``delta = meshgrid(dy, dx)`` ('ij') and adds ``delta[..., 0]`` — the SLOW
    window axis — to the x coordinate, so channel k = a*(2r+1)+b samples
    corr at (x + off[a], y + off[b]). The learned convc1 weights depend on
    exactly this order; a transposed enumeration feeds them permuted
    neighborhoods (regression: the original implementation enumerated x on
    the fast axis)."""
    from univst_tpu.models.raft import _corr_lookup

    rng = np.random.default_rng(0)
    b, h, w, r = 1, 6, 7, 2
    n = b * h * w
    corr = rng.standard_normal((n, h, w)).astype(np.float32)
    # integer coords with >= r margin: bilinear == exact, no padding effects
    cx = rng.integers(r, w - r, (b, h, w)).astype(np.float32)
    cy = rng.integers(r, h - r, (b, h, w)).astype(np.float32)
    coords = jnp.asarray(np.stack([cx, cy], -1))

    got = np.asarray(_corr_lookup([jnp.asarray(corr)], coords, r))
    got = got.reshape(n, (2 * r + 1) ** 2)

    offs = np.arange(-r, r + 1)
    cxf, cyf = cx.reshape(n).astype(int), cy.reshape(n).astype(int)
    k = 0
    for a in range(2 * r + 1):       # x-offset: slow axis (princeton delta[...,0])
        for bb in range(2 * r + 1):  # y-offset: fast axis
            want = corr[np.arange(n), cyf + offs[bb], cxf + offs[a]]
            np.testing.assert_allclose(got[:, k], want, rtol=1e-5, atol=1e-5,
                                       err_msg=f"channel {k} (a={a}, b={bb})")
            k += 1
