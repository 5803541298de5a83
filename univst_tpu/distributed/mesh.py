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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Optional multi-host (pod) initialization — SURVEY §5's DCN story.

    Single-host runs (a v5e-8 is one host) need no init and this is a no-op.
    On a multi-host pod, ``jax.distributed.initialize()`` must run before the
    backend starts so every process sees the global device set; it
    auto-detects the coordinator on TPU pods. Opt-in rather than sniffed:
    call sites (CLI ``setup_jax``) trigger it when either standard env is
    present, because a wrong auto-init on a single host hangs waiting for
    peers.

    Returns True iff distributed mode was initialized (idempotent).
    """
    if not (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("UNIVST_MULTIHOST")):
        return False
    if getattr(maybe_init_distributed, "_done", False):
        return True
    jax.distributed.initialize()  # env/TPU-metadata autodetection
    maybe_init_distributed._done = True
    return True


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


def make_multihost_mesh(
    n_data: Optional[int] = None,
    n_tensor: int = 1,
    devices: Optional[Sequence] = None,
    devices_per_host: Optional[int] = None,
) -> Mesh:
    """('data','tensor') mesh spanning hosts, laid out so collectives that
    matter ride ICI.

    The tensor axis (MMDiT tensor parallelism: per-layer all-reduces, the
    bandwidth-critical traffic) is confined to devices of ONE host; the data
    axis (frame parallelism: only the frame-0 broadcast + a +/-1 frame halo
    per step) is host-major, so only that sparse traffic crosses DCN —
    the scaling-book placement recipe.

    ``devices_per_host`` defaults to the real process grouping
    (``device.process_index``); pass it explicitly to simulate a pod layout
    on a single process (e.g. 2x4 on the 8-virtual-device CPU backend).
    """
    devices = list(devices if devices is not None else jax.devices())
    if devices_per_host is None:
        hosts: dict = {}
        for d in devices:
            hosts.setdefault(getattr(d, "process_index", 0), []).append(d)
        per_host = [hosts[k] for k in sorted(hosts)]
        counts = {len(v) for v in per_host}
        if len(counts) != 1:
            raise ValueError(f"uneven devices per host: {sorted(counts)}")
        devices_per_host = counts.pop()
        # host-major order: consecutive devices share a host
        devices = [d for h in per_host for d in h]
    elif len(devices) % devices_per_host:
        raise ValueError(
            f"{len(devices)} devices do not split into hosts of {devices_per_host}"
        )
    n_hosts = len(devices) // devices_per_host
    if n_tensor > devices_per_host or devices_per_host % n_tensor:
        raise ValueError(
            f"tensor axis {n_tensor} must divide the {devices_per_host} "
            "devices of one host (tensor-parallel all-reduces must stay on ICI)"
        )
    if n_data is None:
        n_data = len(devices) // n_tensor
    if n_data * n_tensor != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_tensor} != {len(devices)} devices across "
            f"{n_hosts} hosts (multi-host meshes must use every device)"
        )
    # [hosts, per_host] -> [hosts, data_in_host, tensor] -> (data, tensor):
    # tensor contiguous within a host, data host-major.
    arr = np.asarray(devices).reshape(
        n_hosts, devices_per_host // n_tensor, n_tensor
    ).reshape(n_data, n_tensor)
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
    """Parse the CLI ``--mesh`` flag: ``'data=4[,tensor=2][,hosts=H]'`` or a
    bare device count ``'8'`` -> a ('data','tensor') mesh; None/'' -> None.

    ``hosts=H`` forces the multi-host (DCN-aware) layout with the global
    device set split into H equal hosts — on a real pod the grouping comes
    from ``device.process_index`` and H is validated against it; on a single
    process it simulates the pod layout (CPU tests).
    """
    if not spec:
        return None
    n_data: Optional[int] = None
    n_tensor = 1
    n_hosts: Optional[int] = None
    for part in spec.split(","):
        k, _, v = part.strip().partition("=")
        if not v:
            n_data = int(k)
        elif k == "data":
            n_data = int(v)
        elif k == "tensor":
            n_tensor = int(v)
        elif k == "hosts":
            n_hosts = int(v)
        else:
            raise ValueError(
                f"unknown mesh axis {k!r} (use data=N[,tensor=M][,hosts=H])"
            )
    if n_hosts is None and jax.process_count() > 1:
        n_hosts = jax.process_count()
    if n_hosts is not None:
        n_devices = len(jax.devices())
        if n_devices % n_hosts:
            raise ValueError(f"{n_devices} devices on {n_hosts} hosts")
        return make_multihost_mesh(
            n_data=n_data, n_tensor=n_tensor,
            devices_per_host=n_devices // n_hosts,
        )
    return make_mesh(n_data=n_data, n_tensor=n_tensor)
