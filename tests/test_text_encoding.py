"""Text-encoder semantics tests.

Covers two round-1 VERDICT items:
  * SD3 CLIP penultimate-hidden-state selection (diffusers encode_prompt takes
    ``hidden_states[-2]``; the reference inherits this via
    custom_pipeline.py:17) — item 3.
  * text conditioning exercised with NON-degenerate prompts (synthetic token
    ids through CLIP/T5 into cross-attention) — item 7.
"""

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.config import SD_BASE_FRAME_INDICES
from univst_tpu.models.clip_text import BOS_TOKEN, EOS_TOKEN, CLIPTextConfig, CLIPTextModel
from univst_tpu.models.layers import VideoCtx
from univst_tpu.models.t5 import T5Config, T5Encoder
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig


def _ids(rng, b=1, l=77):
    ids = rng.integers(1000, 40000, (b, l))
    ids[:, 0] = BOS_TOKEN
    ids[:, -1] = EOS_TOKEN
    return jnp.asarray(ids, jnp.int32)


def _clip():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = _ids(rng)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    return model, params, ids


def test_penultimate_hidden_state_differs_from_final():
    model, params, ids = _clip()
    h_final, p_final = model.apply({"params": params}, ids)
    h_pen, p_pen = model.apply({"params": params}, ids, -2)
    assert np.abs(np.asarray(h_final) - np.asarray(h_pen)).max() > 1e-3
    # pooled output is index-independent (always final-normed EOS state)
    np.testing.assert_allclose(np.asarray(p_final), np.asarray(p_pen))


def test_penultimate_state_ignores_final_layer_norm():
    """hidden_states[-2] must be the PRE-final-LayerNorm activations: scaling
    the final norm changes the default output but not the -2 state."""
    model, params, ids = _clip()
    h_pen, _ = model.apply({"params": params}, ids, -2)
    h_fin, _ = model.apply({"params": params}, ids)
    scaled = jax.tree_util.tree_map(lambda x: x, params)
    scaled["final_layer_norm"] = {
        "scale": params["final_layer_norm"]["scale"] * 2.0,
        "bias": params["final_layer_norm"]["bias"],
    }
    h_pen2, _ = model.apply({"params": scaled}, ids, -2)
    h_fin2, _ = model.apply({"params": scaled}, ids)
    np.testing.assert_allclose(np.asarray(h_pen), np.asarray(h_pen2))
    assert np.abs(np.asarray(h_fin) - np.asarray(h_fin2)).max() > 1e-3


def test_clip_skip_indexing_walks_layers():
    """-(k+2) selects progressively earlier layers; all distinct."""
    model, params, ids = _clip()
    outs = [np.asarray(model.apply({"params": params}, ids, -(k + 2))[0])
            for k in range(model.cfg.num_layers)]
    for a in range(len(outs)):
        for b in range(a + 1, len(outs)):
            assert np.abs(outs[a] - outs[b]).max() > 1e-4


def test_cross_attention_sees_nondegenerate_prompt():
    """A real (synthetic-ids) prompt context reaches the UNet cross-attention
    and changes the epsilon prediction vs the null-prompt context."""
    model, params, ids = _clip()
    rng = np.random.default_rng(1)
    null_ids = jnp.asarray(
        [[BOS_TOKEN, EOS_TOKEN] + [EOS_TOKEN] * 75], jnp.int32
    )
    ctx_prompt, _ = model.apply({"params": params}, ids)
    ctx_null, _ = model.apply({"params": params}, null_ids)
    assert np.abs(np.asarray(ctx_prompt) - np.asarray(ctx_null)).max() > 1e-3

    f = 2
    ucfg = UNetSDConfig.tiny(temporal_identity=True)
    unet = UNetPseudo3D(ucfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((f, 8, 8, 4)), jnp.float32)
    vctx = VideoCtx(num_frames=f, frame_indices=SD_BASE_FRAME_INDICES)
    uparams = unet.init(jax.random.PRNGKey(2), x, jnp.asarray(0), ctx_null, vctx)[
        "params"
    ]
    eps_null, _ = unet.apply({"params": uparams}, x, jnp.asarray(301), ctx_null, vctx)
    eps_prompt, _ = unet.apply(
        {"params": uparams}, x, jnp.asarray(301), ctx_prompt, vctx
    )
    assert not np.isnan(np.asarray(eps_prompt)).any()
    assert np.abs(np.asarray(eps_prompt) - np.asarray(eps_null)).max() > 1e-5


def test_t5_nondegenerate_ids():
    cfg = T5Config.tiny()
    model = T5Encoder(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(10, 2000, (1, 32)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    h = model.apply({"params": params}, ids)
    h0 = model.apply({"params": params}, jnp.zeros_like(ids))
    assert not np.isnan(np.asarray(h)).any()
    assert np.abs(np.asarray(h) - np.asarray(h0)).max() > 1e-4


def test_offline_tokenizer_shims_accept_real_prompts(capsys):
    """Without vocab files both shims must (a) tokenize the null prompt to
    its EXACT reference encoding and (b) tokenize a real prompt offline to
    valid in-range ids via the structural fallbacks (synthetic byte-level
    CLIP vocab / T5 byte ids — models/bpe.py; VERDICT r4 item 7 supersedes
    the r3 reject-with-message contract this test used to pin)."""
    from univst_tpu.models.clip_text import BOS_TOKEN, EOS_TOKEN, Tokenizer
    from univst_tpu.models.t5 import T5TokenizerShim

    for shim, vocab in ((Tokenizer(), 49408), (T5TokenizerShim(), 32128)):
        ids = shim("")
        assert ids.shape[0] == 1 and ids.ndim == 2
        real = shim("a real prompt")
        assert real.shape == ids.shape
        assert real.min() >= 0 and real.max() < vocab
        assert (real != ids).any()  # not silently the null encoding
    null = Tokenizer()("")[0]
    assert null[0] == BOS_TOKEN and (null[1:] == EOS_TOKEN).all()
    # the CLIP fallback says so once, and names the real-vocab fix
    assert "pretrained_model_path" in capsys.readouterr().out
