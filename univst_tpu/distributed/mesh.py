"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2 preamble: no distributed
init anywhere); parallel scaling here is an addition designed TPU-first:

  * mesh axis ``data``: the frame axis (and the 3-branch x frame axis during
    stylization) shards across chips. Sparse-causal attention only needs
    frame 0 everywhere plus a +/-1 frame halo, so XLA lowers the cross-frame
    gathers to one small all-gather + collective-permute over ICI rather than
    full activation all-gathers.
  * mesh axis ``tensor`` (optional): reserved for MMDiT tensor parallelism on
    SD3.5-large; head-dim sharded attention + column/row-split MLPs.

Everything goes through ``jax.jit`` with ``NamedSharding`` constraints; XLA's
SPMD partitioner inserts the collectives (scaling-book recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_tensor: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'tensor') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_tensor
    if n_data * n_tensor > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_tensor} needs more than the "
            f"{len(devices)} available devices"
        )
    devices = devices[: n_data * n_tensor]  # smaller meshes use a prefix
    arr = np.asarray(devices).reshape(n_data, n_tensor)
    return Mesh(arr, ("data", "tensor"))


def shard_batch(x, mesh: Mesh):
    """Place an array with its leading (frame / branch*frame) axis sharded on
    the data axis."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate parameters across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def shard_input(mesh: Optional[Mesh], x, axis: int = 0):
    """Pipeline input helper: frame-axis sharding that is a no-op without a
    mesh and replicates non-divisible axes (e.g. the singleton style
    trajectory). Shared by the SD/AD and SD3 pipelines' ``_shard``."""
    if mesh is None or x is None:
        return x
    import jax.numpy as jnp

    return shard_frames(jnp.asarray(x), mesh, axis)


def replicate_input(mesh: Optional[Mesh], x):
    """Pipeline input helper: replicate one array (no-op without a mesh)."""
    if mesh is None or x is None:
        return x
    import jax.numpy as jnp

    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def frame_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """NamedSharding with the frame axis (at ``axis``) on 'data'."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_frames(x, mesh: Mesh, axis: int = 0):
    """Place ``x`` with its frame axis sharded on 'data'; falls back to
    replication when the axis does not divide (e.g. the [N+1, 1, ...]
    singleton style trajectory, or F < n_devices tiny configs)."""
    n_data = mesh.shape["data"]
    if x.shape[axis] % n_data == 0:
        return jax.device_put(x, frame_sharding(mesh, x.ndim, axis))
    return jax.device_put(x, NamedSharding(mesh, P()))


def parse_mesh_spec(spec: Optional[str]) -> Optional[Mesh]:
    """Parse the CLI ``--mesh`` flag: ``'data=4[,tensor=2]'`` or a bare device
    count ``'8'`` -> a ('data','tensor') mesh; None/'' -> None."""
    if not spec:
        return None
    n_data: Optional[int] = None
    n_tensor = 1
    for part in spec.split(","):
        k, _, v = part.strip().partition("=")
        if not v:
            n_data = int(k)
        elif k == "data":
            n_data = int(v)
        elif k == "tensor":
            n_tensor = int(v)
        else:
            raise ValueError(f"unknown mesh axis {k!r} (use data=N[,tensor=M])")
    return make_mesh(n_data=n_data, n_tensor=n_tensor)
