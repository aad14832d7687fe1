"""Pallas TPU kernel for the K=7 rate-1/4 Viterbi decoder (N6).

Same trellis semantics as ``ops.viterbi`` (the XLA reference — tests assert
bit-identical output); the kernel wins by never materializing the branch
metrics in HBM:

* Forward/ACS kernel: grid streams ``soft`` (T, 4, B) through VMEM in
  TC-step chunks; each step computes all 128 transition metrics as one MXU
  matmul ``W(128x4) @ soft_t(4xB)`` and performs the gather-free ACS on the
  VPU.  Path metrics (64, B) persist in VMEM scratch across the whole grid
  (TPU grids execute sequentially), decisions stream out as uint8.
* Traceback kernel: runs the grid in reverse over the decision chunks,
  carrying the surviving state as a one-hot (64, B) matrix — "which
  decision applies" becomes a multiply+reduce over sublanes and the state
  update ``s' = 2(s&31)+d`` becomes fold + interleave, no gathers.
* Decisions are BIT-PACKED in-kernel: the 64 one-bit decisions of a step
  pack into two int32 words (disjoint-bit adds = OR), so the decision
  tensor — the kernel's dominant HBM traffic, written by ACS and re-read
  by traceback — shrinks 8x vs one int8 per state (e.g. 126 MB -> 16 MB
  for a 576 x 3078 FIC/MSC batch).

Batch B rides the 128-lane dimension (callers pad); states ride sublanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dabtools_tpu import constants as C
from dabtools_tpu.ops.viterbi import NEG_INF, acs_matmul_matrices

TC = 16  # trellis steps per grid iteration (sized so bmsel fits VMEM)


def _acs_kernel(pu_ref, ws_ref, soft_ref, dec_ref, metric_ref, pm_ref,
                bm_ref, *, t_real):
    """Target-major matmul ACS: per step, ``PU @ pm`` stacks both
    predecessors' metrics (rows t and t+64 for target t), the pre-reordered
    branch metrics add in, and the two aligned 64-row halves max/compare.
    No transposes/reshapes anywhere in the recurrence — the critical path
    is one small MXU op + three VPU ops."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        b = pm_ref.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)
        pm_ref[...] = jnp.where(rows == 0, 0.0, NEG_INF).astype(jnp.float32)

    b = pm_ref.shape[-1]
    # All of this chunk's (reordered) branch metrics in one MXU pass;
    # stored step-major so the recurrence reads leading-axis slices.
    bm_ref[...] = jax.lax.dot_general(
        ws_ref[...], soft_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).swapaxes(0, 1)  # (TC, 128, B)
    pu = pu_ref[...]

    shift = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0) % 32

    def step(j, pm):
        gstep = i * TC + j
        # HIGHEST precision: the MXU's default bf16 pass would round the
        # path metrics (one-hot selection must be exact; default-precision
        # rounding compounds over thousands of ACS steps into wrong
        # decisions - observed as BER ~0.13 on clean input).
        pred = jax.lax.dot_general(
            pu, pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # (128, B)
        cand = pred + bm_ref[j]
        c0, c1 = cand[:64, :], cand[64:, :]
        new = jnp.maximum(c0, c1)
        live = gstep < t_real
        dec = (c1 > c0).astype(jnp.int32) * live.astype(jnp.int32)
        # Bit-pack the 64 decisions into two int32 lanes words: disjoint
        # bit positions make the sublane sum an OR (no carries).
        val = jax.lax.shift_left(dec, shift)       # (64, B)
        dec_ref[j] = jnp.concatenate(
            [jnp.sum(val[:32], axis=0, keepdims=True),
             jnp.sum(val[32:], axis=0, keepdims=True)], axis=0)  # (2, B)
        keep = live.astype(jnp.float32)
        return new * keep + pm * (1.0 - keep)

    # Unrolled: lets Mosaic schedule/pipeline across trellis steps instead
    # of paying loop-dispatch latency 3000+ times.
    pm = pm_ref[...]
    for j in range(TC):
        pm = step(j, pm)
    pm_ref[...] = pm

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        metric_ref[0, :] = pm_ref[0, :]


def _traceback_kernel(dec_ref, bits_ref, oh_ref):
    i = pl.program_id(0)
    b = oh_ref.shape[-1]

    @pl.when(i == 0)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)
        oh_ref[...] = jnp.where(rows == 0, 1.0, 0.0).astype(jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)

    def step(k, _):
        j = TC - 1 - k
        oh = oh_ref[...]
        packed = dec_ref[j]                        # (2, B) int32, bit-packed
        word = jnp.where(row < 32, packed[0:1, :], packed[1:2, :])
        dec = (jax.lax.shift_right_logical(word, row % 32) & 1
               ).astype(jnp.float32)               # (64, B)
        bit = jnp.sum(oh[32:, :], axis=0)          # input bit = state>>5
        d_sel = jnp.sum(oh * dec, axis=0)          # decision at the state
        oh32 = oh[:32, :] + oh[32:, :]             # fold away the u bit
        even = oh32 * (1.0 - d_sel)                # -> state 2c
        odd = oh32 * d_sel                         # -> state 2c+1
        oh_ref[...] = (jnp.stack([even, odd], axis=1)  # (32, 2, B)
                       .reshape(64, b))
        bits_ref[j, :] = bit
        return 0

    jax.lax.fori_loop(0, TC, step, 0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_decode_pallas(soft: jnp.ndarray, interpret: bool = False):
    """Drop-in for ``ops.viterbi.viterbi_decode`` (batched form).

    ``soft``: (batch, 4*(n+6)) float32.  Returns (bits (batch, n) uint8,
    metric (batch,) float32).
    """
    b0, n4 = soft.shape
    t_real = n4 // 4
    b = _round_up(max(b0, 1), 128)
    t_pad = _round_up(t_real, TC)
    n_chunks = t_pad // TC

    softp = jnp.zeros((b, t_pad, 4), dtype=jnp.float32)
    softp = softp.at[:b0, :t_real, :].set(
        soft.reshape(b0, t_real, 4).astype(jnp.float32))
    soft_t = softp.transpose(1, 2, 0)              # (T, 4, B)

    pu, ws = acs_matmul_matrices()
    dec, metric = pl.pallas_call(
        functools.partial(_acs_kernel, t_real=t_real),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((128, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 4, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TC, 2, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, 2, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((64, b), jnp.float32),
                        pltpu.VMEM((TC, 128, b), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(pu), jnp.asarray(ws), soft_t)

    bits_t = pl.pallas_call(
        _traceback_kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(
            (TC, 2, b), lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (TC, b), lambda i: (pl.num_programs(0) - 1 - i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, b), jnp.float32)],
        interpret=interpret,
    )(dec)

    bits = bits_t.transpose(1, 0)[:b0, : t_real - C.TAIL_BITS].astype(jnp.uint8)
    return bits, metric[0, :b0]
