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
