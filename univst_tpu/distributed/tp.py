"""Tensor-parallel sharding rules for the SD3/SD3.5 MMDiT.

The reference is single-GPU; SD3.5-large (8B, 38 blocks x 2432 hidden) wants a
tensor axis on top of frame parallelism (SURVEY.md §5). These are Megatron-
style rules expressed as NamedShardings — XLA's SPMD partitioner inserts the
psum after the row-parallel matmuls:

  * attention to_q/to_k/to_v and add_*_proj: column-parallel (heads sharded)
  * to_out / to_add_out: row-parallel
  * MLP fc1 column-parallel, fc2 row-parallel
  * norms, modulation linears, embedders: replicated

Activations stay sharded on ('data',) over the frame/branch axis.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj", "fc1"}
_ROW = {"to_out", "to_add_out", "fc2"}


def _spec_for(path) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    leaf = names[-2] if len(names) >= 2 else ""
    param = names[-1] if names else ""
    if leaf in _COL:
        return P(None, "tensor") if param == "kernel" else P("tensor")
    if leaf in _ROW:
        return P("tensor", None) if param == "kernel" else P()
    return P()


def mmdit_param_shardings(params, mesh: Mesh):
    """NamedSharding tree for MMDiT params under a ('data','tensor') mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path)), params
    )


def shard_mmdit_params(params, mesh: Mesh):
    """Place MMDiT params with tensor-parallel shardings."""
    shardings = mmdit_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
