"""Mesh setup and sharding specs (frame-axis parallelism over ICI)."""

from univst_tpu.distributed.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
