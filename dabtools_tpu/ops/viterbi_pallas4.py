"""Radix-4 Pallas Viterbi: two trellis steps fused per iteration (N6).

Halves the sequential chain of the radix-2 kernel (`viterbi_pallas.py`):
each iteration selects among 4 predecessors over a fused 2-step path using
the constant operators from ``ops.viterbi.acs_radix4_matrices``.  Same
conventions, bit-identical output (tests compare against the XLA scan).

DAB codeword lengths are always even (T = data_bits + 6, data_bits even),
which radix-4 requires.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dabtools_tpu import constants as C
from dabtools_tpu.ops.viterbi import NEG_INF, acs_radix4_matrices

TC2 = 8  # double-steps (= 16 trellis steps) per grid iteration


def _acs4_kernel(pu_ref, ws_ref, soft_ref, t2_ref, dec_ref, metric_ref,
                 pm_ref, bm_ref, *w8_scratch, select="matmul",
                 skip_dec=False, pack="shift4", bm="f32"):
    """``skip_dec`` (timing probes ONLY — tools/viterbi_pack_probe.py):
    skip the decision pack-and-store, leaving ``dec_ref`` unwritten
    (garbage) while the path metrics stay exact.  Timing full-vs-skip
    isolates the packing cost (shift + 4x 16-sublane sums per step) to
    decide whether an MXU-packed realization is worth building.

    ``pack`` picks that realization (DABTOOLS_VITERBI4_PACK):
      shift4 — four int32 words of 16 two-bit decisions each, packed
               with shift_left + four 16-sublane sums (the historical
               default; the sublane-reduce trees are pure VPU work on
               the critical chain).
      mxu8   — eight words of 8 decisions each via ONE MXU pass:
               dec8 = W8 @ (d*live) with W8[w,t] = 4^(t&7)·[t>>3 == w].
               Every product is d·2^(2k) (exact in bf16: power-of-two
               scale, 2-bit mantissa) and partial sums stay < 2^16
               (exact in the MXU's f32 accumulator), so the packed
               words are EXACT at default dot precision — and the MXU
               work can overlap the next step's VPU ops instead of
               serializing with them.  ``dec_ref`` is (TC2, 8, B).
    """
    w8_ref = w8_scratch[0] if pack == "mxu8" else None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        b = pm_ref.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)
        pm_ref[...] = jnp.where(rows == 0, 0.0, NEG_INF).astype(jnp.float32)
        if pack == "mxu8":
            # W8[w, t] = 4^(t&7) iff t>>3 == w — built once into scratch
            # (an extra kernel INPUT would change the default path's HLO
            # and invalidate every prewarmed cache entry)
            r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 0)
            c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 1)
            w8_ref[...] = jnp.where(
                (c8 >> 3) == r8,
                jax.lax.shift_left(1, 2 * (c8 & 7)), 0
            ).astype(jnp.float32)

    b = pm_ref.shape[-1]
    # This chunk's fused branch metrics in one MXU pass, step-major.
    if bm == "bf16":
        # bf16-STORED branch metrics (``DABTOOLS_VITERBI4_BM``): the MXU
        # still accumulates in f32; only the (TC2, 256, B) scratch is
        # rounded to bf16, halving the kernel's dominant scoped-VMEM
        # term and therefore raising the lane ceiling (B_CHUNK 896 ->
        # 1280).  Path metrics stay f32 — only each step's ADDED branch
        # metric carries bf16 rounding (|err| <= 2^-9 |bm|), so decode
        # decisions can flip only in sub-LSB ties; with soft inputs that
        # are bf16-exact the kernel is BIT-IDENTICAL to the f32 build
        # (pinned by test_bm_bf16_exact_inputs_bit_identical).  Separate
        # branch so the default path's HLO (= persistent-cache key)
        # stays byte-stable.
        bm_ref[...] = jax.lax.dot_general(
            ws_ref[...], soft_ref[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).swapaxes(0, 1).astype(
            jnp.bfloat16)                            # (TC2, 256, B) bf16
    else:
        bm_ref[...] = jax.lax.dot_general(
            ws_ref[...], soft_ref[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).swapaxes(0, 1)  # (TC2,256,B)
    pu = pu_ref[...]

    shift = 2 * (jax.lax.broadcasted_iota(jnp.int32, (64, b), 0) % 16)

    def step(j, pm):
        g2 = i * TC2 + j
        # pred[p*64+t] = pm[4*(t&15)+p]: a pure one-hot selection.  Two
        # interchangeable realizations (DABTOOLS_VITERBI4_SELECT):
        #   matmul  — PU4 @ pm at HIGHEST (6-pass f32) MXU precision; the
        #             historical default, exact by construction.  (A HIGH
        #             3-pass variant was tried and removed: Mosaic rejects
        #             non-HIGHEST f32 dot precision on this target —
        #             "Unsupported dot precision: HIGH", v5e AOT compile.)
        #   shuffle — no MXU at all: reshape pm (64,B)->(16,4,B) [a=s>>2,
        #             p=s&3], swap to (4,16,B), broadcast over the free
        #             t_hi axis; row p*64 + t_hi*16 + a == pred row.
        #             Bit-exact data movement on the VPU.
        if select == "shuffle":
            gt = pm.reshape(16, 4, b).transpose(1, 0, 2)   # (4, 16, B)
            pred = jnp.broadcast_to(
                gt[:, None, :, :], (4, 4, 16, b)).reshape(256, b)
        else:
            pred = jax.lax.dot_general(
                pu, pm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (256, B)
        cand = (pred + bm_ref[j]).reshape(4, 64, b)
        if pack == "mxu8" and not skip_dec:
            # Select-based decision build, straight to f32 for the MXU
            # pack — no int casts or arithmetic on the chain.  Kept in a
            # fully separate branch so the DEFAULT path's op order (and
            # therefore its HLO text = persistent-cache key) stays
            # byte-stable.
            m01 = jnp.maximum(cand[0], cand[1])
            m23 = jnp.maximum(cand[2], cand[3])
            new = jnp.maximum(m01, m23)
            g2v = i * TC2 + j
            livem = g2v < t2_ref[...]              # (1, B) bool
            df = jnp.where(m23 > m01,
                           jnp.where(cand[3] > cand[2], 3.0, 2.0),
                           jnp.where(cand[1] > cand[0], 1.0, 0.0))
            dl = jnp.where(livem, df, 0.0)         # dead steps pack 0
            dec_ref[j] = jax.lax.dot_general(
                w8_ref[...], dl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(jnp.int32)                    # (8, B), exact
            return jnp.where(livem, new, pm)
        m01 = jnp.maximum(cand[0], cand[1])
        d01 = (cand[1] > cand[0]).astype(jnp.int32)
        m23 = jnp.maximum(cand[2], cand[3])
        d23 = (cand[3] > cand[2]).astype(jnp.int32)
        hi = (m23 > m01).astype(jnp.int32)
        new = jnp.maximum(m01, m23)
        d = hi * (2 + d23) + (1 - hi) * d01
        # Per-LANE liveness: lanes may carry codewords of different
        # lengths (FIC + several MSC profile groups decode as ONE
        # dispatch — see ``viterbi_decode_ragged``).  A dead step
        # freezes the lane's path metrics and records decision 0, under
        # which traceback's state 0 maps to predecessor 0 — so the
        # padded tail is a fixed point at the tail-terminated state and
        # the short lane's traceback is untouched.
        live = g2 < t2_ref[...]                    # (1, B) bool
        if not skip_dec:                           # (mxu8 returned above)
            # Pack the 64 two-bit decisions into four int32 words (16
            # states per word; disjoint bit positions make the sublane
            # sum an OR).
            val = jax.lax.shift_left(d * live.astype(jnp.int32), shift)
            dec_ref[j] = jnp.concatenate(
                [jnp.sum(val[16 * c:16 * (c + 1)], axis=0, keepdims=True)
                 for c in range(4)], axis=0)       # (4, B)
        return jnp.where(live, new, pm)            # freeze dead lanes

    pm = pm_ref[...]
    for j in range(TC2):
        pm = step(j, pm)
    pm_ref[...] = pm

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        metric_ref[0, :] = pm_ref[0, :]


def _traceback4_kernel(dec_ref, bits_ref, oh16_ref, uh_ref,
                       *, pack="shift4"):
    """Survivor-path traceback with the state FACTORIZED.

    The 64-state one-hot t = 32*u2 + 16*u1 + a (a = t & 15, u = t >> 4)
    is carried as the outer product of ``uh`` (4, B — one-hot over u)
    and ``oh16`` (16, B — one-hot over a).  Everything the step needs
    falls out of the factors at (4, B)/(16, B) width instead of the
    previous (64, B) selects and sublane reductions (~3x fewer
    vector-op units per step, and the step count — T/2 — is the whole
    cost of this kernel):

    * output bits: u1 = uh[1]+uh[3], u2 = uh[2]+uh[3];
    * the packed decision word for t is word u, so ``sum(uh * packed)``
      selects it with no row-wise where;
    * predecessor t' = 4a + p (p = this state's 2-bit decision), i.e.
      a' = 4*(a & 3) + p and u' = a >> 2 — both are row-major
      reshape+sum folds of oh16.
    """
    i = pl.program_id(0)
    b = oh16_ref.shape[-1]

    @pl.when(i == 0)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (16, b), 0)
        oh16_ref[...] = jnp.where(rows == 0, 1.0, 0.0).astype(jnp.float32)
        rows4 = jax.lax.broadcasted_iota(jnp.int32, (4, b), 0)
        uh_ref[...] = jnp.where(rows4 == 0, 1.0, 0.0).astype(jnp.float32)

    rowa = jax.lax.broadcasted_iota(jnp.int32, (16, b), 0)

    def step(k, _):
        j = TC2 - 1 - k
        oh16 = oh16_ref[...]                       # (16, B) one-hot over a
        uh = uh_ref[...]                           # (4, B) one-hot over u
        packed = dec_ref[j]                        # int32, bit-packed
        bits_ref[2 * j, :] = uh[1] + uh[3]         # u1 (earlier input bit)
        bits_ref[2 * j + 1, :] = uh[2] + uh[3]     # u2
        if pack == "mxu8":
            # state t = 16u + a lives in word w = 2u + (a>>3) at bit
            # offset 2*(a&7); select the u-row's two words, pick by a's
            # high bit, shift by its low bits
            uh_i = uh.astype(jnp.int32)
            pr = packed.reshape(4, 2, b)           # (u, a_hi, B)
            w0 = jnp.sum(uh_i * pr[:, 0], axis=0, keepdims=True)
            w1 = jnp.sum(uh_i * pr[:, 1], axis=0, keepdims=True)
            whi = jnp.where(rowa < 8,
                            jnp.broadcast_to(w0, (16, b)),
                            jnp.broadcast_to(w1, (16, b)))
            dec16 = (jax.lax.shift_right_logical(whi, 2 * (rowa & 7)) & 3
                     ).astype(jnp.float32)         # (16, B), values 0..3
        else:
            word = jnp.sum(uh.astype(jnp.int32) * packed, axis=0,
                           keepdims=True)          # (1, B): packed[u]
            dec16 = (jax.lax.shift_right_logical(word, 2 * rowa) & 3
                     ).astype(jnp.float32)         # (16, B), values 0..3
        d_sel = jnp.sum(oh16 * dec16, axis=0)      # (B,): decision p of t
        r = oh16.reshape(4, 4, b)                  # (a>>2, a&3, B)
        uh_ref[...] = jnp.sum(r, axis=1)           # u' = a >> 2
        q4 = jnp.sum(r, axis=0)                    # (4, B) one-hot over a&3
        branches = [q4 * (jnp.abs(d_sel - p) < 0.5).astype(jnp.float32)
                    for p in range(4)]
        oh16_ref[...] = (jnp.stack(branches, axis=1)   # (4(q), 4(p), B)
                         .reshape(16, b))          # row 4q+p = a'
        return 0

    jax.lax.fori_loop(0, TC2, step, 0)


def _traceback4_kernel_onehot64(dec_ref, bits_ref, oh_ref):
    """Pre-factorization traceback (full (64, B) one-hot carry), kept as
    a selectable realization (``DABTOOLS_VITERBI4_TRACEBACK=onehot64``)
    for A/B timing on hardware and as an escape hatch should the
    factored kernel's strided folds lower poorly on some target."""
    i = pl.program_id(0)
    b = oh_ref.shape[-1]

    @pl.when(i == 0)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)
        oh_ref[...] = jnp.where(rows == 0, 1.0, 0.0).astype(jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)

    def step(k, _):
        j = TC2 - 1 - k
        oh = oh_ref[...]
        packed = dec_ref[j]                        # (4, B) int32, bit-packed
        word = jnp.where(
            row < 16, packed[0:1, :],
            jnp.where(row < 32, packed[1:2, :],
                      jnp.where(row < 48, packed[2:3, :], packed[3:4, :])))
        dec = (jax.lax.shift_right_logical(word, 2 * (row % 16)) & 3
               ).astype(jnp.float32)               # values 0..3, (64, B)
        u2 = jnp.sum(oh[32:, :], axis=0)            # bit 5 of the state
        u1 = (jnp.sum(oh[16:32, :], axis=0)
              + jnp.sum(oh[48:, :], axis=0))        # bit 4
        d_sel = jnp.sum(oh * dec, axis=0)           # (B,)
        oh16 = (oh[0:16, :] + oh[16:32, :]
                + oh[32:48, :] + oh[48:64, :])      # fold away u1,u2
        branches = [oh16 * (jnp.abs(d_sel - p) < 0.5).astype(jnp.float32)
                    for p in range(4)]
        oh_ref[...] = (jnp.stack(branches, axis=1)  # (16, 4, B)
                       .reshape(64, b))
        bits_ref[2 * j, :] = u1                     # earlier input bit
        bits_ref[2 * j + 1, :] = u2
        return 0

    jax.lax.fori_loop(0, TC2, step, 0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Lane-batch ceiling per kernel call.  Scoped VMEM is the binding
# constraint: the branch-metric scratch (TC2, 256, B) f32 plus the
# TC2-unrolled step temporaries total ~1.94 MB per 128 lanes (measured:
# Mosaic wants 17.45 MB at B=1152 and the AOT compiler HARD-FAILS over
# its 16 MiB scoped limit; B=1024 fits at ~15.5 MB, too close).  896
# compiles with ~2.4 MB margin for every DAB codeword length.  Bigger
# batches are decoded in sequential chunks — the same serialization a
# vmap-over-pallas grid would impose, but each chunk at FULL lane
# occupancy instead of the vmap's per-slice width.
B_CHUNK = 896
# bf16-stored branch metrics halve the dominant scratch term: at B=1280
# the extrapolated budget is ~14.2 MB (bm 5.24 + ~8.9 B-proportional
# rest), inside the 16 MiB scoped limit with margin comparable to the
# f32 build's.  Validate with the AOT probe on hardware before raising.
B_CHUNK_BF16 = 1280


def b_chunk_for(bm: str) -> int:
    return B_CHUNK_BF16 if bm == "bf16" else B_CHUNK


@functools.partial(jax.jit,
                   static_argnames=("interpret", "select", "traceback",
                                    "skip_dec", "pack", "bm"))
def _decode4_call(soft: jnp.ndarray, t2: jnp.ndarray,
                  interpret: bool = False, select: str = "matmul",
                  traceback: str = "factored", skip_dec: bool = False,
                  pack: str = "shift4", bm: str = "f32"):
    """One kernel invocation (batch must respect the VMEM ceiling).

    ``t2``: (batch,) int32 — per-lane codeword length in DOUBLE trellis
    steps (= T_lane // 2).  Lanes shorter than the tensor's padded
    length freeze after their own tail (see the liveness note in
    ``_acs4_kernel``); the zero-filled soft positions beyond a lane's
    length never reach the path metrics.
    """
    b0, n4 = soft.shape
    t_real = n4 // 4
    if t_real % 2:
        raise ValueError("radix-4 kernel requires an even codeword length")
    t2_real = t_real // 2
    b = _round_up(max(b0, 1), 128)
    t2_pad = _round_up(t2_real, TC2)
    n_chunks = t2_pad // TC2

    softp = jnp.zeros((b, t2_pad, 8), dtype=jnp.float32)
    softp = softp.at[:b0, :t2_real, :].set(
        soft.reshape(b0, t2_real, 8).astype(jnp.float32))
    soft_t = softp.transpose(1, 2, 0)              # (T2, 8, B)
    t2p = jnp.zeros((1, b), jnp.int32).at[0, :b0].set(
        t2.astype(jnp.int32))                      # pad lanes: length 0

    pu4, ws4 = acs_radix4_matrices()
    n_words = 8 if pack == "mxu8" else 4
    bm_dtype = jnp.bfloat16 if bm == "bf16" else jnp.float32
    acs_scratch = [pltpu.VMEM((64, b), jnp.float32),
                   pltpu.VMEM((TC2, 256, b), bm_dtype)]
    if pack == "mxu8":
        acs_scratch.append(pltpu.VMEM((8, 64), jnp.float32))  # W8
    dec, metric = pl.pallas_call(
        functools.partial(_acs4_kernel, select=select, skip_dec=skip_dec,
                          pack=pack, bm=bm),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((256, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC2, 8, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TC2, n_words, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t2_pad, n_words, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ),
        scratch_shapes=acs_scratch,
        interpret=interpret,
    )(jnp.asarray(pu4), jnp.asarray(ws4), soft_t, t2p)

    if traceback == "factored":
        tb_kernel = functools.partial(_traceback4_kernel, pack=pack)
        tb_scratch = [pltpu.VMEM((16, b), jnp.float32),
                      pltpu.VMEM((4, b), jnp.float32)]
    else:
        if pack == "mxu8":
            raise ValueError(
                "pack='mxu8' supports only the factored traceback")
        tb_kernel = _traceback4_kernel_onehot64
        tb_scratch = [pltpu.VMEM((64, b), jnp.float32)]
    bits_t = pl.pallas_call(
        tb_kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(
            (TC2, n_words, b),
            lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (2 * TC2, b), lambda i: (pl.num_programs(0) - 1 - i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * t2_pad, b), jnp.float32),
        scratch_shapes=tb_scratch,
        interpret=interpret,
    )(dec)

    bits = (bits_t.transpose(1, 0)[:b0, : t_real - C.TAIL_BITS]
            .astype(jnp.uint8))
    return bits, metric[0, :b0]


@functools.cache
def _decode4_vmappable(interpret: bool, select: str = "matmul",
                       traceback: str = "factored",
                       pack: str = "shift4", bm: str = "f32"):
    """Batch-aware entry point (cached per ``interpret`` value).

    Two TPU-first behaviors the plain kernel lacks:

    * batches beyond the VMEM ceiling are decoded in ``B_CHUNK``-row
      chunks (sequential kernel calls at full lane width);
    * ``jax.vmap`` COLLAPSES the mapped axis into the lane batch via a
      ``custom_vmap`` rule instead of lifting the kernel into a serial
      grid loop of narrow slices.  This is the config-3 fix: the
      channel-parallel receiver vmaps the whole pipeline, and without
      this rule 8 channels ran the ACS chain 8x sequentially at ~1/8th
      lane occupancy (VERDICT r3 item 2).
    """
    from jax import custom_batching

    chunk = b_chunk_for(bm)

    @custom_batching.custom_vmap
    def decode(soft, t2):
        b0 = soft.shape[0]
        if b0 <= chunk:
            return _decode4_call(soft, t2, interpret, select, traceback,
                                 pack=pack, bm=bm)
        outs = [_decode4_call(soft[i: i + chunk], t2[i: i + chunk],
                              interpret, select, traceback, pack=pack,
                              bm=bm)
                for i in range(0, b0, chunk)]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    @decode.def_vmap
    def _rule(axis_size, in_batched, soft, t2):  # noqa: ANN001
        soft_b, t2_b = in_batched
        if not soft_b and not t2_b:
            return decode(soft, t2), (False, False)
        if not soft_b:
            soft = jnp.broadcast_to(soft[None], (axis_size, *soft.shape))
        if not t2_b:
            t2 = jnp.broadcast_to(t2[None], (axis_size, *t2.shape))
        lead, rows, n4 = soft.shape
        bits, metric = decode(soft.reshape(lead * rows, n4),
                              t2.reshape(lead * rows))
        return ((bits.reshape(lead, rows, bits.shape[-1]),
                 metric.reshape(lead, rows)), (True, True))

    return decode


_SELECTS = ("matmul", "shuffle")
_TRACEBACKS = ("factored", "onehot64")
_PACKS = ("shift4", "mxu8")
_BMS = ("f32", "bf16")


def viterbi_decode_pallas4(soft: jnp.ndarray, interpret: bool = False,
                           select: str | None = None,
                           lengths=None,
                           traceback: str | None = None,
                           pack: str | None = None,
                           bm: str | None = None):
    """Radix-4 drop-in for ``viterbi_decode_pallas`` (same contract);
    vmap-collapsing and VMEM-chunked (see ``_decode4_vmappable``).

    ``lengths`` (optional): (batch,) int — per-lane mother-codeword
    trellis length (incl. tail) for RAGGED batches, each even and
    <= ``soft.shape[-1] // 4``; short lanes are zero-padded on the
    right.  Lane ``k``'s information bits are ``bits[k, :lengths[k] -
    TAIL_BITS]``; positions beyond are zeros.  This is what lets FIC
    and every MSC profile group share ONE kernel dispatch
    (``ops.viterbi.viterbi_decode_ragged``).

    ``select`` (or ``DABTOOLS_VITERBI4_SELECT``) picks the ACS
    predecessor-selection realization — see ``_acs4_kernel``.  Default
    ``shuffle``: on-chip datum 2026-08-20 (viterbi_select_probe, good
    window) measured shuffle 2.70 ms vs matmul 3.48 ms at (576, 3078)
    with decoded bits verified OK via device compare + timing readout —
    the VPU reshape beats the 256x64 HIGHEST-precision MXU pass, and
    both realizations are bit-exact data movement by construction
    (test_select_variants_bit_identical).

    ``traceback`` (or ``DABTOOLS_VITERBI4_TRACEBACK``) picks the
    traceback realization: ``factored`` (default — (16,B)+(4,B) state
    factors) or ``onehot64`` (the full (64,B) carry).

    ``pack`` (or ``DABTOOLS_VITERBI4_PACK``) picks the decision-word
    packing: ``shift4`` (default) or ``mxu8`` (one MXU pass per step in
    place of the four 16-sublane reduce trees; factored traceback
    only — see ``_acs4_kernel``).  Flip the default only on a
    hardware A/B datum (tools/viterbi_pack_probe.py decides whether
    the experiment is even worth timing).

    ``bm`` (or ``DABTOOLS_VITERBI4_BM``) picks the branch-metric
    scratch storage: ``f32`` (default, bit-exact vs the XLA scan) or
    ``bf16`` (MXU still accumulates f32; only the stored metric rounds
    to bf16 — sub-LSB decision ties may flip, BER-invisible at DAB
    operating points — halving the dominant scoped-VMEM term and
    raising the per-call lane ceiling ``B_CHUNK`` 896 -> 1280: one
    fewer sequential chunk at the 64-frame/config-3 lane counts).
    Flip only on a hardware datum (the lane-scaling probe must first
    show chunk cost is NOT proportional to lanes).
    """
    if soft.ndim != 2:
        raise ValueError("expected (batch, 4*T) soft bits")
    t_max = soft.shape[-1] // 4
    if t_max % 2:
        raise ValueError("radix-4 kernel requires an even codeword length")
    if select is None:
        select = os.environ.get("DABTOOLS_VITERBI4_SELECT", "shuffle")
    if select not in _SELECTS:
        raise ValueError(f"select must be one of {_SELECTS}")
    if traceback is None:
        traceback = os.environ.get("DABTOOLS_VITERBI4_TRACEBACK",
                                   "factored")
    if traceback not in _TRACEBACKS:
        raise ValueError(f"traceback must be one of {_TRACEBACKS}")
    if pack is None:
        pack = os.environ.get("DABTOOLS_VITERBI4_PACK", "shift4")
    if pack not in _PACKS:
        raise ValueError(f"pack must be one of {_PACKS}")
    if bm is None:
        bm = os.environ.get("DABTOOLS_VITERBI4_BM", "f32")
    if bm not in _BMS:
        raise ValueError(f"bm must be one of {_BMS}")
    if lengths is None:
        t2 = jnp.full((soft.shape[0],), t_max // 2, jnp.int32)
    else:
        ln = np.asarray(lengths) if not isinstance(
            lengths, jnp.ndarray) else lengths
        if isinstance(ln, np.ndarray):      # concrete: validate now
            if ln.shape != (soft.shape[0],):
                raise ValueError("lengths must be (batch,)")
            if (ln % 2).any() or (ln > t_max).any() or (ln <= 0).any():
                raise ValueError("each lane length must be even, positive "
                                 "and <= the padded codeword length")
        t2 = jnp.asarray(ln, jnp.int32) // 2
    return _decode4_vmappable(bool(interpret), select, traceback,
                              pack, bm)(soft, t2)
