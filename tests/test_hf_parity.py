"""Numerical converter+model parity against Hugging Face reference models.

The round-1 gap: converters were structure-tested only (no hub access for
real checkpoints). transformers IS installed, so the text encoders can be
verified end-to-end numerically: instantiate the HF torch model at a tiny
config, convert its randomly-initialized state_dict with the strict
converters, and compare forward outputs. This is the same code path a real
SD-1.5 / SD3 text-encoder checkpoint takes (reference builds them via
transformers from_pretrained, src/sd/run_content_inversion_sd.py:39-40,
src/sd3/run_content_inversion_sd3.py:42-52).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from univst_tpu.models import convert as cv
from univst_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from univst_tpu.models.t5 import T5Config, T5Encoder


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _ids(rng, l=77, vocab=49000):
    ids = rng.integers(10, vocab, (2, l))
    ids[:, 0] = 49406
    ids[:, -1] = 49407
    return ids


def test_clip_text_matches_transformers():
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel as HFModel

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        vocab_size=49408, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    hf = HFModel(hf_cfg).eval()
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = _ids(rng)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32))["params"]
    params = cv.merge_into_params(init, cv.convert_clip_text(_np_sd(hf), cfg))

    with torch.no_grad():
        out = hf(torch.tensor(ids), output_hidden_states=True)
    got_h, got_p = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got_h), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_p), out.pooler_output.numpy(), rtol=1e-4, atol=1e-5
    )
    # penultimate hidden state — what SD3's encode_prompt consumes
    got_pen, _ = model.apply({"params": params}, jnp.asarray(ids, jnp.int32), -2)
    np.testing.assert_allclose(
        np.asarray(got_pen), out.hidden_states[-2].numpy(), rtol=1e-4, atol=1e-5
    )


def test_clip_text_with_projection_matches_transformers():
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection as HFModel

    torch.manual_seed(1)
    hf_cfg = HFCfg(
        vocab_size=49408, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu", projection_dim=24,
    )
    hf = HFModel(hf_cfg).eval()
    cfg = CLIPTextConfig.tiny(hidden_act="gelu", projection_dim=24)
    model = CLIPTextModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = _ids(rng)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32))["params"]
    params = cv.merge_into_params(init, cv.convert_clip_text(_np_sd(hf), cfg))

    with torch.no_grad():
        out = hf(torch.tensor(ids))
    got_h, got_p = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got_h), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_p), out.text_embeds.numpy(), rtol=1e-4, atol=1e-5
    )


def test_t5_encoder_matches_transformers():
    from transformers import T5Config as HFCfg
    from transformers import T5EncoderModel as HFModel

    torch.manual_seed(2)
    hf_cfg = HFCfg(
        vocab_size=32128, d_model=32, d_kv=16, d_ff=64, num_layers=2,
        num_heads=2, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        relative_attention_num_buckets=32, relative_attention_max_distance=128,
    )
    hf = HFModel(hf_cfg).eval()
    cfg = T5Config.tiny()
    model = T5Encoder(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(10, 32000, (2, 16))
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32))["params"]
    params = cv.merge_into_params(init, cv.convert_t5(_np_sd(hf), cfg))

    with torch.no_grad():
        out = hf(torch.tensor(ids)).last_hidden_state
    got = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), out.numpy(), rtol=2e-4, atol=2e-5)
