"""Analytic matmul/conv FLOP counting by walking a traced jaxpr.

Used by bench.py for MFU reporting: the XLA ``compiled.cost_analysis()``
surface is unreliable through the remote-TPU relay, so FLOPs are counted from
the jaxpr instead — ``dot_general`` and ``conv_general_dilated`` only (the
standard MFU convention; elementwise/normalization FLOPs are ignored).
``scan`` bodies are multiplied by trip count; ``pjit``/``closed_call``/
``custom_*`` bodies are recursed into. Pallas kernels (``pallas_call``) are
opaque at the jaxpr level, so callers on the kernel path should count the
equivalent einsum formulation (attention FLOPs = 4*B*H*Lq*Lk*dh).
"""

from __future__ import annotations

import math

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    (contract_l, _), (batch_l, _) = eqn.params["dimension_numbers"]
    a = eqn.invars[0].aval
    b = eqn.invars[1].aval
    batch = math.prod(a.shape[i] for i in batch_l)
    k = math.prod(a.shape[i] for i in contract_l)
    m = math.prod(
        a.shape[i] for i in range(a.ndim) if i not in contract_l and i not in batch_l
    )
    bc = eqn.params["dimension_numbers"][1][1]
    n = math.prod(
        b.shape[i]
        for i in range(b.ndim)
        if i not in eqn.params["dimension_numbers"][0][1] and i not in bc
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    # rhs spec: (out_c, in_c/groups, *spatial)
    rhs_shape = [rhs.shape[i] for i in dn.rhs_spec]
    in_c_per_group = rhs_shape[1]
    kernel_spatial = math.prod(rhs_shape[2:])
    out_elems = math.prod(out.shape)
    return 2.0 * out_elems * in_c_per_group * kernel_spatial


def _walk(jaxpr, mult: float = 1.0) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += mult * _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += mult * _conv_flops(eqn)
        elif name == "scan":
            total += _walk(eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"])
        elif name == "while":
            # trip count unknown; count the body once
            total += _walk(eqn.params["body_jaxpr"].jaxpr, mult)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += _walk(getattr(sub, "jaxpr", sub), mult)
                    break
            else:
                for branch in eqn.params.get("branches", ()):  # cond
                    total += _walk(branch.jaxpr, mult)  # upper bound: all arms
    return total


def count_matmul_flops(fn, *args, **kwargs) -> float:
    """Total dot/conv FLOPs of one call of ``fn(*args, **kwargs)``."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return float(_walk(jaxpr.jaxpr))


def attention_extra_flops(
    batch: int, heads: int, lq: int, lk: int, dh: int
) -> float:
    """QK^T + PV FLOPs of one attention (for Pallas paths the jaxpr can't see)."""
    return 4.0 * batch * heads * lq * lk * dh


def tree_bytes(tree) -> int:
    return sum(
        np.prod(x.shape) * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
    )
