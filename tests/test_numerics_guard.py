"""Numerics sanity under jax_debug_nans (SURVEY.md s5.2: the sanitizer
analog — functional JAX has no data races; NaN guards are the remaining
numeric hazard class)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dabtools_tpu.models.receiver import block_samples, process_block

from tests.test_closed_loop import build_ensemble, modulate


def test_pipeline_is_nan_free_under_debug_nans():
    ens = build_ensemble()
    x, _ = modulate(ens, 6, seed=0)
    from dabtools_tpu.ops.fec import init_deinterleave_ring
    rings = {str(s.subchid): init_deinterleave_ring(s.profile.tx_bits)
             for s in ens.subchannels}
    jax.config.update("jax_debug_nans", True)
    try:
        out, _, _ = process_block(
            jnp.asarray(x[:block_samples(4)]), rings,
            jnp.asarray(0, jnp.int32), ensemble=ens, n_frames=4)
        jax.block_until_ready(out)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(np.asarray(out["cfo_carriers"]))
    # all-zero input must not NaN either (silence / squelch case)
    jax.config.update("jax_debug_nans", True)
    try:
        out, _, _ = process_block(
            jnp.zeros(block_samples(4), jnp.complex64), {},
            jnp.asarray(0, jnp.int32), ensemble=None, n_frames=4)
        jax.block_until_ready(out)
    finally:
        jax.config.update("jax_debug_nans", False)
