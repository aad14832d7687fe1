"""Batched device RS (DAB+ 120,110 and packet-FEC 204,188) vs the NumPy
reference codec."""

import numpy as np

import jax.numpy as jnp

from dabtools_tpu import constants as C
from dabtools_tpu.ops.rs import make_rs_decoder, rs_decode_batch
from dabtools_tpu.utils.gf256 import rs_decode, rs_encode, rs_parity


def _batch(rng, n_rows, errs):
    data = rng.integers(0, 256, size=(n_rows, C.RS_K), dtype=np.uint8)
    cw = rs_encode(data)
    bad = cw.copy()
    for row, k in enumerate(errs):
        pos = rng.choice(C.RS_N, size=k, replace=False)
        for p in pos:
            bad[row, p] ^= rng.integers(1, 256)
    return data, bad


def test_matches_reference_across_error_counts():
    rng = np.random.default_rng(0)
    errs = [0, 1, 2, 3, 4, 5, 5, 0]
    data, bad = _batch(rng, len(errs), errs)
    dev_data, dev_n = rs_decode_batch(jnp.asarray(bad))
    ref_data, ref_n = rs_decode(bad)
    np.testing.assert_array_equal(np.asarray(dev_data), data)
    assert np.asarray(dev_n).tolist() == errs
    np.testing.assert_array_equal(np.asarray(dev_data), ref_data)
    assert np.asarray(dev_n).tolist() == ref_n.tolist()


def test_uncorrectable_flagged():
    rng = np.random.default_rng(1)
    _, bad = _batch(rng, 4, [7, 8, 6, 2])
    dev_data, dev_n = rs_decode_batch(jnp.asarray(bad))
    n = np.asarray(dev_n)
    assert n[3] == 2          # the correctable row still corrects
    assert (n[:3] == -1).all()


def test_large_batch():
    rng = np.random.default_rng(2)
    errs = list(rng.integers(0, 6, size=256))
    data, bad = _batch(rng, 256, errs)
    dev_data, dev_n = rs_decode_batch(jnp.asarray(bad))
    np.testing.assert_array_equal(np.asarray(dev_data), data)
    assert np.asarray(dev_n).tolist() == errs


def test_rs_204_188_matches_reference():
    """The factory's RS(204,188) (packet-mode FEC, t=8) against NumPy."""
    n, k = 204, 188
    rng = np.random.default_rng(3)
    errs = [0, 1, 4, 8, 8, 0, 9, 12]           # last two: uncorrectable
    data = rng.integers(0, 256, size=(len(errs), k), dtype=np.uint8)
    cw = np.concatenate([data, rs_parity(data, n - k)], axis=1)
    bad = cw.copy()
    for row, e in enumerate(errs):
        pos = rng.choice(n, size=e, replace=False)
        for p in pos:
            bad[row, p] ^= rng.integers(1, 256)
    dev_data, dev_n = make_rs_decoder(n, k)(jnp.asarray(bad))
    ref_data, ref_n = rs_decode(bad, n_parity=n - k)
    np.testing.assert_array_equal(np.asarray(dev_data), ref_data)
    assert np.asarray(dev_n).tolist() == ref_n.tolist()
    want = [e if e <= 8 else -1 for e in errs]
    assert np.asarray(dev_n).tolist() == want
    np.testing.assert_array_equal(np.asarray(dev_data)[:6], data[:6])
