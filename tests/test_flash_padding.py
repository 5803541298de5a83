"""CPU-verifiable semantics of the TPU flash padding path (ADVICE r2 low).

The flash path in attention/ops.py:heads_attention only executes on TPU, so
its padding, segment-id masking, and block-size selection would otherwise be
hardware-only code. flash_pad/flash_block_plan are factored out precisely so
this suite can prove, on CPU:
  * the padded + segment-masked attention equals plain sdpa on the original
    shapes (the exact math the kernel computes given those segment ids);
  * the block plan always divides the padded lengths (the kernel requirement
    whose violation silently truncates coverage).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univst_tpu.attention.ops import flash_block_plan, flash_pad, sdpa


def _masked_sdpa(qh, kh, vh, kv_seg):
    """sdpa with the flash kernel's segment-id semantics: q tokens are
    segment 0, kv tokens with segment 1 never match (logit -> -inf)."""
    dh = qh.shape[-1]
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", qh, kh, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    if kv_seg is not None:
        mask = (kv_seg != 0)[:, None, None, :]
        logits = jnp.where(mask, -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs.astype(vh.dtype), vh)


# SD3-joint-like (4429 scaled down: non-128-multiple T and S), plus the
# asymmetric cross/self shapes the SD path uses
@pytest.mark.parametrize(
    "tq,s",
    [(277, 277), (1045, 1045), (256, 277), (1024, 1045), (277, 512),
     (1536, 4429 % 2048), (640, 640)],
)
def test_padded_masked_attention_matches_sdpa(tq, s):
    b, h, dh = 2, 3, 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    qh = jax.random.normal(kq, (b, h, tq, dh), jnp.float32)
    kh = jax.random.normal(kk, (b, h, s, dh), jnp.float32)
    vh = jax.random.normal(kv, (b, h, s, dh), jnp.float32)

    qp, kp, vp, kv_seg, tq_pad, s_pad = flash_pad(qh, kh, vh)
    assert qp.shape[2] == tq_pad and kp.shape[2] == s_pad
    assert tq_pad % 128 == 0 and s_pad % 128 == 0
    out_padded = _masked_sdpa(qp, kp, vp, kv_seg)[:, :, :tq]
    out_direct = sdpa(qh, kh, vh)
    np.testing.assert_allclose(
        np.asarray(out_padded), np.asarray(out_direct), atol=2e-5, rtol=2e-5
    )


def test_pad_noop_when_aligned():
    qh = jnp.zeros((1, 2, 512, 16))
    kh = jnp.zeros((1, 2, 1024, 16))
    qp, kp, _, kv_seg, tq_pad, s_pad = flash_pad(qh, kh, kh)
    assert qp.shape == qh.shape and kp.shape == kh.shape
    assert kv_seg is None and tq_pad == 512 and s_pad == 1024


@pytest.mark.parametrize(
    "tq,s", [(4429, 4429), (4096, 8192), (4096, 4096), (1045, 1045),
             (256, 640), (9216, 9216), (277, 1000003)],
)
def test_block_plan_divides_padded_lengths(tq, s):
    qh = jnp.zeros((1, 1, tq, 16))
    kh = jnp.zeros((1, 1, s, 16))
    *_, tq_pad, s_pad = flash_pad(qh, kh, kh)
    bq, bkm, bk = flash_block_plan(tq_pad, s_pad)
    assert tq_pad % bq == 0 and s_pad % bkm == 0 and s_pad % bk == 0
    assert bk <= bkm  # library invariant: minor block within major


def test_sd3_joint_shape_gets_1536_blocks():
    # 4429 -> 4608 = 3 x 1536: the tuned fast blocks
    qh = jnp.zeros((1, 1, 4429, 16))
    *_, tq_pad, s_pad = flash_pad(qh, qh, qh)
    assert (tq_pad, s_pad) == (4608, 4608)
    assert flash_block_plan(tq_pad, s_pad) == (1536, 1536, 512)
    # the SD shapes keep their tuned 1024
    assert flash_block_plan(4096, 8192) == (1024, 1024, 512)
