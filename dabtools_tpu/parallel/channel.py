"""Channel-parallel decoding: many IQ streams at once (N13; BASELINE
config #3).

Pure data parallelism: the per-stream pipeline is vmapped over a leading
``channels`` axis and the batch is laid out with a NamedSharding over the
mesh's ``channels`` axis — XLA partitions the whole program with zero
communication (each ensemble is independent).  This is the scaling
dimension the single-stream reference fundamentally lacks.

All streams share one ``Ensemble`` *shape* config (sizes the jit); in a
real multi-mux deployment streams with distinct MCIs run as separate jit
specializations — same code, different static arg.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dabtools_tpu import constants as C
from dabtools_tpu.fic.config import Ensemble
from dabtools_tpu.models.receiver import pipeline_core
from dabtools_tpu.ops.sync import coarse_null_sync


@functools.partial(
    jax.jit,
    static_argnames=("ensemble", "mode", "n_frames", "search",
                     "max_int_cfo", "mesh"))
def channel_parallel_block(x, rings, cif_count, *,
                           ensemble: Ensemble | None, mode=C.MODE_I,
                           n_frames: int = 8, search: int = 192,
                           max_int_cfo: int = 8,
                           mesh: jax.sharding.Mesh | None = None):
    """Decode a batch of streams: ``x`` (n_channels, block_samples).

    ``rings`` pytree leaves carry a leading ``n_channels`` axis; returns the
    same structure as ``process_block`` with a leading channel axis.  With
    ``mesh`` given, inputs/outputs are constrained to NamedSharding over the
    ``channels`` axis so the computation shards across devices.
    """
    if mesh is not None:
        spec = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("channels"))
        x = jax.lax.with_sharding_constraint(x, spec)

    def one(xc, rc):
        sync = coarse_null_sync(xc, mode)
        off = jnp.arange(n_frames, dtype=jnp.int32) * mode.frame_size
        return pipeline_core(
            xc, sync["null_start"] + off, rc, cif_count,
            ensemble=ensemble, mode=mode, search=search,
            max_int_cfo=max_int_cfo,
            sync_diag={"null_start": sync["null_start"],
                       "null_ratio": sync["null_ratio"]})

    out, new_rings, new_cif = jax.vmap(one)(x, rings)
    return out, new_rings, new_cif[0]
