"""Parallelism tier: device meshes, sharded E-steps, multi-host init."""

from poccala_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_estep,
    pad_batch_for_mesh,
    replicate_bank,
    shard_bank_states,
)

__all__ = [
    "make_mesh",
    "make_parallel_estep",
    "pad_batch_for_mesh",
    "replicate_bank",
    "shard_bank_states",
]
