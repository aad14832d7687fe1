"""Batched soft-decision Viterbi for the DAB K=7 rate-1/4 code (N6).

Reference counterpart: `upstream:viterbi.c` (R12, a scalar C ACS loop with
traceback).  This is NOT a translation — the trellis is reformulated for
TPU:

* Branch metrics for ALL transitions of ALL time steps are one matmul:
  a constant ``W in {+1,-1}^(128 x 4)`` maps the 4 soft bits of a step to
  the 128 (state, input) transition metrics, so the whole codeword's branch
  metrics are ``soft @ W.T`` — an MXU op, hoisted out of the scan.
* The ACS recursion needs NO gathers: with path metrics viewed as
  ``pm[c, b]`` (c = state>>1, b = state&1), the two predecessors of targets
  ``u*32 + c`` are exactly ``pm[c, 0]`` and ``pm[c, 1]`` — a reshape +
  transpose, which on TPU is a lane shuffle, not a memory gather.
* The time recursion is a `lax.scan` carrying ``pm`` (kept in
  registers/VMEM by XLA); decisions stream out as uint8.
* Traceback is a second (reverse) scan; the per-step "pick my decision bit"
  is a one-hot reduction, again gather-free.

Conventions (shared with mod.convcode — see its docstring):
soft > 0 means coded bit 0; erasures (punctured positions) are exactly 0.

A Pallas kernel with identical semantics lives in ``viterbi_pallas.py``;
this XLA version is the always-available reference implementation and is
what the tests pin down.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dabtools_tpu import constants as C
from dabtools_tpu.mod.convcode import output_table

NEG_INF = -1e30

# Process-wide override of the "auto" implementation choice, set by
# ``force_impl`` (e.g. the receiver's fallback after a persistent Pallas
# kernel failure).  Callers that jit around viterbi_decode must clear
# their jit caches after flipping this — resolution happens at trace time.
_FORCED: str | None = None


def force_impl(impl: str | None) -> None:
    """Override auto implementation choice ("pallas"/"xla"; None = reset)."""
    global _FORCED
    _FORCED = impl


def resolved_impl() -> str:
    """What ``impl="auto"`` resolves to right now.

    Priority: ``force_impl`` > ``DABTOOLS_VITERBI`` env var > backend
    default — **Pallas on TPU** (the production path; BASELINE names this
    kernel), XLA elsewhere (interpret-mode Pallas would be slow on CPU).
    """
    import os
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("DABTOOLS_VITERBI")
    if env:
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@functools.cache
def transition_matrix() -> np.ndarray:
    """W: (128, 4) float32; row ``4*c + 2*b + u`` is the +/-1 pattern of the
    coded bits on the transition (state=2c+b) --input u--> (u*32 + c)."""
    table = output_table()  # out[reg] -> 4 bits, reg = (u << 6) | state
    w = np.empty((128, 4), dtype=np.float32)
    for c in range(32):
        for b in range(2):
            for u in range(2):
                reg = (u << 6) | (2 * c + b)
                w[4 * c + 2 * b + u] = 1.0 - 2.0 * table[reg]
    return w


@functools.cache
def acs_radix4_matrices():
    """Radix-4 ACS operators: two trellis steps fused (Pallas N6 fast path).

    After inputs (u1, u2), state s reaches t = u2<<5 | u1<<4 | s>>2, so
    target t has 4 predecessors ``4*(t&15)+p``.  ``PU4`` (256, 64) row
    ``p*64+t`` picks predecessor p of target t; ``WS4`` (256, 8) holds the
    +/-1 pattern of the 8 coded bits along that 2-step path (first step's
    4 bits, then the second's).
    """
    table = output_table()
    pu4 = np.zeros((256, 64), dtype=np.float32)
    ws4 = np.empty((256, 8), dtype=np.float32)
    for t in range(64):
        u2, u1 = t >> 5, (t >> 4) & 1
        for p in range(4):
            pred = 4 * (t & 15) + p
            mid = (u1 << 5) | (pred >> 1)
            reg1 = (u1 << 6) | pred
            reg2 = (u2 << 6) | mid
            r = p * 64 + t
            pu4[r, pred] = 1.0
            ws4[r, :4] = 1.0 - 2.0 * table[reg1]
            ws4[r, 4:] = 1.0 - 2.0 * table[reg2]
    return pu4, ws4


@functools.cache
def acs_matmul_matrices():
    """Target-major ACS operators for the matmul formulation (Pallas N6).

    ``PU`` (128, 64): rows 0..63 pick predecessor ``2t mod 64`` of target t,
    rows 64..127 pick ``2t mod 64 + 1`` — so ``PU @ pm`` yields both
    predecessors' metrics, stacked, with NO gathers/transposes.
    ``WS`` (128, 4): the +/-1 coded-bit pattern of the corresponding
    transition, so ``WS @ soft_t`` is the matching branch-metric stack.
    """
    table = output_table()
    pu = np.zeros((128, 64), dtype=np.float32)
    ws = np.empty((128, 4), dtype=np.float32)
    for r in range(128):
        t = r % 64
        pred = (2 * t) % 64 + (1 if r >= 64 else 0)
        u = t >> 5
        pu[r, pred] = 1.0
        ws[r] = 1.0 - 2.0 * table[(u << 6) | pred]
    return pu, ws


def _acs_scan(bm: jnp.ndarray, pm0: jnp.ndarray):
    """bm: (T, batch, 32, 2, 2) branch metrics; pm0: (batch, 64).

    Returns (final pm, decisions (T, batch, 64) uint8).
    """

    def step(pm, bm_t):
        # pm[batch, 64] viewed as pairs: pred states (2c, 2c+1) -> pm2[c, b]
        pm2 = pm.reshape(pm.shape[0], 32, 2, 1)
        cand = pm2 + bm_t                       # [batch, 32, 2(b), 2(u)]
        take1 = (cand[:, :, 1, :] > cand[:, :, 0, :])
        new = jnp.max(cand, axis=2)             # [batch, 32, 2(u)]
        # target state index = u*32 + c  ->  axes (u, c)
        new = new.transpose(0, 2, 1).reshape(pm.shape[0], 64)
        dec = take1.transpose(0, 2, 1).reshape(pm.shape[0], 64)
        return new, dec.astype(jnp.uint8)

    return jax.lax.scan(step, pm0, bm)


def _traceback(decisions: jnp.ndarray) -> jnp.ndarray:
    """decisions: (T, batch, 64) uint8 -> decoded bits (batch, T) uint8.

    Starts from state 0 (the zero tail guarantees it).
    """
    batch = decisions.shape[1]
    state0 = jnp.zeros((batch,), dtype=jnp.int32)

    def step(state, dec_t):
        bit = (state >> 5).astype(jnp.uint8)
        onehot = jax.nn.one_hot(state, 64, dtype=dec_t.dtype)
        d = jnp.sum(onehot * dec_t, axis=-1).astype(jnp.int32)
        prev = 2 * (state & 31) + d
        return prev, bit

    _, bits_rev = jax.lax.scan(step, state0, decisions[::-1])
    return bits_rev[::-1].transpose(1, 0)


def viterbi_decode(soft: jnp.ndarray, impl: str = "auto"):
    """Decode a batch of mother codewords.

    ``soft``: (batch, 4*(n+6)) float32, positive => coded bit 0, 0 = erasure.
    Returns ``(bits, metric)``: bits (batch, n) uint8 information bits (tail
    stripped); metric (batch,) float32 — the winning path's correlation with
    the received soft bits (a BER/confidence proxy, SURVEY.md s5.5).

    ``impl``: "xla" (lax.scan), "pallas" (the N6 kernel), or "auto" —
    see :func:`resolved_impl` (Pallas is the production default on TPU;
    the receiver falls back to XLA if the kernel fails persistently).
    """
    if impl == "auto":
        impl = resolved_impl()
    if impl == "pallas":
        soft = jnp.asarray(soft, dtype=jnp.float32)
        squeeze1 = soft.ndim == 1
        if squeeze1:
            soft = soft[None]
        interp = jax.default_backend() != "tpu"   # Mosaic needs real HW
        if (soft.shape[-1] // 4) % 2 == 0:
            from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
            bits, metric = viterbi_decode_pallas4(soft, interpret=interp)
        else:
            from dabtools_tpu.ops.viterbi_pallas import viterbi_decode_pallas
            bits, metric = viterbi_decode_pallas(soft, interpret=interp)
        return (bits[0], metric[0]) if squeeze1 else (bits, metric)
    soft = jnp.asarray(soft, dtype=jnp.float32)
    if soft.ndim == 1:
        soft = soft[None]
        squeeze = True
    else:
        squeeze = False
    batch, n4 = soft.shape
    assert n4 % 4 == 0, "mother codeword length must be a multiple of 4"
    t_steps = n4 // 4

    w = jnp.asarray(transition_matrix())                     # (128, 4)
    bm = jnp.einsum("btf,rf->btr", soft.reshape(batch, t_steps, 4), w,
                    preferred_element_type=jnp.float32)
    bm = bm.reshape(batch, t_steps, 32, 2, 2).transpose(1, 0, 2, 3, 4)

    pm0 = jnp.full((batch, 64), NEG_INF, dtype=jnp.float32)
    pm0 = pm0.at[:, 0].set(0.0)
    pm_final, decisions = _acs_scan(bm, pm0)
    bits = _traceback(decisions)

    info = bits[:, : t_steps - C.TAIL_BITS]
    metric = pm_final[:, 0]
    if squeeze:
        return info[0], metric[0]
    return info, metric


def viterbi_decode_ragged(softs, impl: str = "auto"):
    """Decode several codeword batches of (possibly) DIFFERENT lengths as
    ONE kernel dispatch where the backend supports it.

    ``softs``: sequence of (batch_i, 4*T_i) soft-bit arrays (same
    conventions as :func:`viterbi_decode`).  Returns a list of
    ``(bits_i, metric_i)`` in the same order, each bit-identical to
    ``viterbi_decode(softs[i], impl)``.

    On the radix-4 Pallas path the batches are right-padded to the
    longest T, concatenated along lanes, and decoded with a per-lane
    length vector — so a heterogeneous mux (FIC + several UEP/EEP
    profile groups) costs ONE ACS chain instead of one per group.  The
    TPU win is structural: lane batches round up to 128, so e.g. the
    flagship's 9x64-CIF MSC batch (576 lanes -> padded 640) absorbs the
    64 FIC codewords literally for free.  Reference counterpart: none —
    upstream (R9/R15) decodes each codeword in a scalar C loop.

    Falls back to per-batch calls on the XLA/radix-2 paths (an odd T in
    the mix forces radix-2) — semantically identical, just N dispatches.
    """
    softs = [jnp.asarray(s, jnp.float32) for s in softs]
    if not softs:
        return []
    if any(s.ndim != 2 for s in softs):
        raise ValueError("each batch must be (batch_i, 4*T_i) soft bits")
    if impl == "auto":
        impl = resolved_impl()
    ts = [s.shape[-1] // 4 for s in softs]
    if (impl == "pallas" and len(softs) > 1
            and all(t % 2 == 0 for t in ts)):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        n4_max = max(s.shape[-1] for s in softs)
        soft = jnp.concatenate(
            [jnp.pad(s, ((0, 0), (0, n4_max - s.shape[-1])))
             for s in softs], axis=0)
        lengths = np.concatenate(
            [np.full(s.shape[0], t, np.int32)
             for s, t in zip(softs, ts)])
        interp = jax.default_backend() != "tpu"
        bits, metric = viterbi_decode_pallas4(soft, interpret=interp,
                                              lengths=lengths)
        out, o = [], 0
        for s, t in zip(softs, ts):
            b = s.shape[0]
            out.append((bits[o: o + b, : t - C.TAIL_BITS],
                        metric[o: o + b]))
            o += b
        return out
    return [viterbi_decode(s, impl=impl) for s in softs]
