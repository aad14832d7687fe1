"""Batched shortened-RS decoding on device (N12's jnp half).

GF(2^8) arithmetic runs as exp/log-table gathers (tables are trace-time
constants); everything is fixed-shape and batch-leading so thousands of
codewords decode as one XLA program:

  syndromes -> Berlekamp-Massey (fixed 2t iterations, masked) -> Chien over
  the n positions (one matmul-shaped table lookup) -> Forney -> verify.

`make_rs_decoder(n, k)` builds a jitted decoder for any shortened code
with generator roots alpha^0..alpha^{n-k-1} over field poly 0x11D:
the DAB+ RS(120,110) (`rs_decode_batch`, TS 102 563) and the packet-mode
FEC's RS(204,188) (EN 300 401 s5.3.5, `eti.pfec`).  Cross-checked against
the NumPy reference (`utils.gf256`) in tests.  The host
`eti.dabplus.SuperframeDecoder` stays NumPy (stream rates are tiny); this
path feeds the batched multi-ensemble bench (BASELINE config #2/#3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dabtools_tpu import constants as C
from dabtools_tpu.utils.gf256 import _tables

@functools.cache
def _const_tables(_N: int, _T: int):
    _2T = 2 * _T
    exp, log = _tables()
    exp510 = np.zeros(512, dtype=np.int32)
    exp510[:510] = exp[:510]
    exp510[510:] = exp[:2]
    # syndrome exponents: syn_pow[i, j] = (j * (N-1-i)) mod 255
    i = np.arange(_N)[:, None]
    j = np.arange(_2T)[None, :]
    syn_pow = (j * (_N - 1 - i)) % 255
    # Chien: position p has locator X_p = alpha^{N-1-p}; we evaluate
    # Lambda(X_p^{-1}): chien_pow[p, d] = (d * (255 - (N-1-p))) mod 255
    p = np.arange(_N)[:, None]
    d = np.arange(_T + 1)[None, :]
    chien_pow = (d * (255 - (_N - 1 - p) % 255)) % 255
    # Forney numerator powers: omega evaluated at X_p^{-1}
    d2 = np.arange(_2T)[None, :]
    forney_pow = (d2 * (255 - (_N - 1 - p) % 255)) % 255
    # X_p itself (for the b=0 Forney factor)
    x_pow = (_N - 1 - np.arange(_N)) % 255
    return (np.asarray(log), exp510, syn_pow, chien_pow, forney_pow, x_pow)


def _gf_mul(a, b, log, exp):
    """Element-wise GF mult of int32 arrays via table gathers."""
    la = log[a]
    lb = log[b]
    prod = exp[la + lb]
    return jnp.where((a == 0) | (b == 0), 0, prod)


def _gf_inv(a, log, exp):
    return jnp.where(a == 0, 0, exp[255 - log[a]])


def _xor_reduce(x, axis):
    n = x.shape[axis]
    pad = 1
    while pad < n:
        pad *= 2
    if pad != n:
        padding = [(0, 0)] * x.ndim
        padding[axis] = (0, pad - n)
        x = jnp.pad(x, padding)
    while x.shape[axis] > 1:
        h = x.shape[axis] // 2
        a = jax.lax.slice_in_dim(x, 0, h, axis=axis)
        b = jax.lax.slice_in_dim(x, h, 2 * h, axis=axis)
        x = a ^ b
    return jnp.squeeze(x, axis=axis)


@functools.cache
def make_rs_decoder(n: int = C.RS_N, k: int = C.RS_K):
    """Jitted batch decoder for the shortened RS(n, k) code.

    Returns ``decode(codewords (batch, n) uint8) ->
    (data (batch, k) uint8, n_corrected (batch,) int32)`` with
    ``n_corrected = -1`` marking uncorrectable rows (data passed through).
    """
    _N, _K = n, k
    _T = (n - k) // 2
    _2T = 2 * _T
    log_t, exp_t, syn_pow, chien_pow, forney_pow, x_pow = _const_tables(
        _N, _T)

    @jax.jit
    def rs_decode_batch(codewords: jnp.ndarray):
        log = jnp.asarray(log_t)
        exp = jnp.asarray(exp_t)
        cw = codewords.astype(jnp.int32)               # (B, N)
        bsz = cw.shape[0]

        # ---- syndromes (B, 2T)
        lc = log[cw]                                   # (B, N)
        contrib = exp[lc[:, :, None] + jnp.asarray(syn_pow)[None]]
        contrib = jnp.where(cw[:, :, None] == 0, 0, contrib)
        synd = _xor_reduce(contrib, axis=1)            # (B, 2T)
        clean = jnp.all(synd == 0, axis=-1)

        # ---- Berlekamp-Massey (fixed 2T iterations)
        c_poly = jnp.zeros((bsz, _2T + 1), jnp.int32).at[:, 0].set(1)
        b_poly = jnp.zeros((bsz, _2T + 1), jnp.int32).at[:, 0].set(1)
        l = jnp.zeros((bsz,), jnp.int32)
        m = jnp.ones((bsz,), jnp.int32)
        bb = jnp.ones((bsz,), jnp.int32)
        idx = jnp.arange(_2T + 1)

        def bm_step(i, carry):
            c_poly, b_poly, l, m, bb = carry
            # d = S_i ^ sum_{j=1..l} C_j * S_{i-j}
            j = idx                                     # 0..2T
            s_idx = i - j
            s_val = jnp.where((s_idx >= 0) & (s_idx < _2T),
                              jnp.take_along_axis(
                                  synd, jnp.clip(s_idx, 0, _2T - 1)[None, :]
                                  .repeat(bsz, 0), axis=1), 0)
            terms = _gf_mul(c_poly, s_val, log, exp)
            terms = jnp.where((j[None, :] >= 1) & (j[None, :] <= l[:, None]),
                              terms, 0)
            d = synd[:, i] ^ _xor_reduce(terms, axis=1)

            coef = _gf_mul(d, _gf_inv(bb, log, exp), log, exp)  # (B,)
            # shifted = x^m * B(x)
            sh_idx = idx[None, :] - m[:, None]
            shifted = jnp.where(
                sh_idx >= 0,
                jnp.take_along_axis(b_poly, jnp.clip(sh_idx, 0, _2T), axis=1), 0)
            c_new = c_poly ^ _gf_mul(coef[:, None], shifted, log, exp)

            d0 = d == 0
            grow = (~d0) & (2 * l <= i)
            c_out = jnp.where(d0[:, None], c_poly, c_new)
            b_out = jnp.where(grow[:, None], c_poly, b_poly)
            l_out = jnp.where(grow, i + 1 - l, l)
            bb_out = jnp.where(grow, d, bb)
            m_out = jnp.where(d0 | ~grow, m + 1, jnp.ones_like(m))
            return (c_out, b_out, l_out, m_out, bb_out)

        c_poly, b_poly, l, m, bb = jax.lax.fori_loop(
            0, _2T, bm_step, (c_poly, b_poly, l, m, bb))

        # ---- Chien search: evaluate Lambda at X_p^{-1} for all N positions
        lam = c_poly[:, : _T + 1]                      # deg <= T relevant
        lam_terms = exp[log[lam][:, None, :] + jnp.asarray(chien_pow)[None]]
        lam_terms = jnp.where(lam[:, None, :] == 0, 0, lam_terms)
        lam_eval = _xor_reduce(lam_terms, axis=2)      # (B, N)
        is_root = (lam_eval == 0)
        n_roots = jnp.sum(is_root.astype(jnp.int32), axis=-1)

        # ---- Forney: Omega = S*C mod x^{2T}; e_p = X_p * Om(X_p^-1)/C'(X_p^-1)
        # Omega coefficients (B, 2T)
        conv_idx = jnp.arange(_2T)
        s_mat = jnp.where(
            (conv_idx[:, None] - conv_idx[None, :]) >= 0,
            jnp.take_along_axis(
                synd[:, None, :].repeat(_2T, 1),
                jnp.clip(conv_idx[:, None] - conv_idx[None, :], 0, _2T - 1)
                [None].repeat(bsz, 0), axis=2), 0)     # (B, i, j) = S_{i-j}
        c_trim = c_poly[:, : _2T]
        omega = _xor_reduce(_gf_mul(c_trim[:, None, :], s_mat, log, exp), axis=2)

        om_terms = exp[log[omega][:, None, :] + jnp.asarray(forney_pow)[None]]
        om_terms = jnp.where(omega[:, None, :] == 0, 0, om_terms)
        om_eval = _xor_reduce(om_terms, axis=2)        # (B, N)

        # C'(x): odd coefficients; C'(X^-1) = sum_{j odd} C_j X^{-(j-1)}
        odd = jnp.arange(1, _T + 1, 2)
        dpow = ((odd[None, :] - 1) * (255 - (_N - 1 - jnp.arange(_N)[:, None])
                                      % 255)) % 255    # (N, n_odd)
        c_odd = c_poly[:, odd]                         # (B, n_odd)
        dterms = exp[log[c_odd][:, None, :] + dpow[None]]
        dterms = jnp.where(c_odd[:, None, :] == 0, 0, dterms)
        d_eval = _xor_reduce(dterms, axis=2)           # (B, N)

        x_val = exp[jnp.asarray(x_pow)][None, :]       # (1, N) X_p
        mag = _gf_mul(_gf_mul(x_val, om_eval, log, exp),
                      _gf_inv(d_eval, log, exp), log, exp)
        corrected = cw ^ jnp.where(is_root & (d_eval != 0), mag, 0)

        # ---- verify
        lc2 = log[corrected]
        contrib2 = exp[lc2[:, :, None] + jnp.asarray(syn_pow)[None]]
        contrib2 = jnp.where(corrected[:, :, None] == 0, 0, contrib2)
        synd2 = _xor_reduce(contrib2, axis=1)
        ok = jnp.all(synd2 == 0, axis=-1) & (n_roots == l) & (l <= _T)

        n_corrected = jnp.where(clean, 0, jnp.where(ok, l, -1))
        out = jnp.where(clean[:, None], cw, jnp.where(ok[:, None], corrected, cw))
        return out[:, :_K].astype(jnp.uint8), n_corrected

    return rs_decode_batch


def rs_decode_batch(codewords):
    """Decode (batch, 120) uint8 DAB+ codewords (TS 102 563)."""
    return make_rs_decoder()(codewords)
