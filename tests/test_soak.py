"""Long-stream soak: a minute of impaired signal through the streaming
receiver in ragged chunks — continuous ETI, bounded host state, stable
sync. (CPU; guards against state leaks that only show over many blocks.)"""

import numpy as np

from dabtools_tpu import constants as C
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.mod.impairments import awgn, carrier_offset
from dabtools_tpu.models.receiver import DabReceiver
from tests.test_closed_loop import build_ensemble, modulate


def test_long_stream_soak():
    ens = build_ensemble()
    n_frames = 625                       # 60 s of stream
    x, payload = modulate(ens, n_frames, seed=42)
    rng = np.random.default_rng(7)
    x = awgn(carrier_offset(x, 180.0), 14.0, rng)

    rx = DabReceiver(n_frames=8)
    eti = []
    pos = 0
    step = 1_000_003                     # ragged, prime-sized chunks
    while pos < x.size:
        eti += rx.feed(x[pos:pos + step])
        pos += step

    assert rx.ensemble is not None
    frames = list(EtiParser().feed(b"".join(eti)))
    # ~60 s minus acquisition/priming/tail: expect the vast majority
    assert len(frames) >= (n_frames - 30) * C.MODE_I.n_cifs
    a = rx._activation_cif
    bad = sum(f.subchannel_data(1) != payload[1][a + k].tobytes()
              for k, f in enumerate(frames))
    assert bad == 0, f"{bad}/{len(frames)} payload mismatches"
    assert all(f.fct == k % 250 for k, f in enumerate(frames))
    # Host state stays bounded (pruning horizons hold).
    assert len(rx._fib_fifo) <= rx.MAX_PENDING_CIFS + 64
    assert len(rx.stats) <= rx.MAX_STATS
    assert sum(len(v) for v in rx._subch_fifo.values()) <= \
        rx.MAX_PENDING_CIFS + 64
    # Sync stayed locked the whole way (no re-acquisitions).
    assert all(s.fib_crc_bad == 0 for s in rx.stats[2:])
