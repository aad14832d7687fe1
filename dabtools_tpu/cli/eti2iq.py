"""``eti2iq``: ETI(NI) in, modulated baseband IQ out (a DAB test
transmitter — the `ODR-DabMod` role in the dabtools ecosystem).

Replays any ETI artifact as RF: sub-channel organization comes from the
FIC carried in the stream itself (FIG 0/1), the FIBs and MST bytes are
re-modulated verbatim with the standard-exact modulator (N17), so
``dab2eti(eti2iq(mux.eti))`` closes the loop bit-exactly.  Optional
calibrated impairments (AWGN / carrier offset / timing offset) make it a
receiver-test signal generator.

Usage:
  python -m dabtools_tpu.cli.eti2iq mux.eti -o out.cf32
  python -m dabtools_tpu.cli.eti2iq --format u8 --snr 12 --cfo-hz 350 mux.eti -o out.u8
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger("dabtools_tpu.eti2iq")


def main(argv=None) -> int:
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")   # host byte/NumPy work
    except Exception:  # pragma: no cover - backend already initialized
        pass
    p = argparse.ArgumentParser(prog="eti2iq", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("input", help="ETI(NI) file, or '-' for stdin")
    p.add_argument("--output", "-o", default="-",
                   help="IQ output file ('-' = stdout)")
    p.add_argument("--format", choices=("cf32", "u8"), default="cf32",
                   help="complex64, or u8 offset-128 interleaved (the "
                        "RTL-SDR wire format)")
    p.add_argument("--mode", choices=("I", "II", "III", "IV"), default="I",
                   help="DAB transmission mode to modulate")
    p.add_argument("--snr", type=float, default=None,
                   help="add AWGN at this SNR (dB)")
    p.add_argument("--cfo-hz", type=float, default=0.0,
                   help="apply a carrier frequency offset")
    p.add_argument("--timing-offset", type=int, default=0,
                   help="prepend this many zero samples")
    p.add_argument("--frames", type=int, default=None,
                   help="stop after N transmission frames")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(name)s: %(message)s")

    from dabtools_tpu import constants as C
    from dabtools_tpu.eti.parse import EtiParser
    from dabtools_tpu.fic.fig import FigParser
    from dabtools_tpu.mod.modulator import Modulator, SubchannelSource

    mode = C.MODES[args.mode]
    f = sys.stdin.buffer if args.input == "-" else open(args.input, "rb")
    parser = EtiParser(mode=mode)
    fig = FigParser()
    frames = []
    while True:
        chunk = f.read(1 << 20)
        if not chunk:
            break
        for frame in parser.feed(chunk):
            frames.append(frame)
            for i in range(0, len(frame.fic), 32):
                fig.feed_fib(frame.fic[i:i + 32])
    if args.input != "-":
        f.close()
    if not frames:
        log.error("no ETI frames found")
        return 1
    ens = fig.ensemble()
    if ens is None:
        log.error("no MCI in the ETI FIC; cannot derive the sub-channel "
                  "organization")
        return 1

    n_tx = len(frames) // mode.n_cifs
    if args.frames is not None:
        n_tx = min(n_tx, args.frames)
    if not n_tx:
        log.error("need at least %d ETI frames for one Mode %s "
                  "transmission frame", mode.n_cifs, mode.name)
        return 1
    subs = ens.sorted_subchannels()
    missing = [s.subchid for s in subs
               if s.subchid not in frames[0].streams]
    if missing:
        log.warning("sub-channels %s signalled in FIC but absent from the "
                    "MST; modulating zeros for them", missing)
    log.info("modulating %d Mode %s frames, %d sub-channels "
             "(ensemble 0x%04X %r)", n_tx, mode.name, len(subs), ens.eid,
             ens.label)

    mod = Modulator([SubchannelSource(s.start_cu, s.profile)
                     for s in subs], mode=mode)
    fibs_per_cif = mode.n_fibs // mode.n_cifs

    def fibs_fn(t):
        rows = []
        for c in range(mode.n_cifs):
            fic = frames[t * mode.n_cifs + c].fic
            rows += [np.frombuffer(fic[32 * i:32 * (i + 1)], np.uint8)
                     for i in range(fibs_per_cif)]
        return np.stack(rows)

    def payload_fn(t, i):
        s = subs[i]
        rows = []
        for c in range(mode.n_cifs):
            fr = frames[t * mode.n_cifs + c]
            if s.subchid in fr.streams:
                d = np.frombuffer(fr.subchannel_data(s.subchid), np.uint8)
            else:
                d = np.zeros(s.data_bytes, np.uint8)
            rows.append(np.unpackbits(d))
        return np.stack(rows)

    x = mod.frames(n_tx, fibs_fn, payload_fn)

    from dabtools_tpu.mod.impairments import (
        awgn,
        carrier_offset,
        quantize_u8,
        timing_offset,
    )
    if args.timing_offset:
        x = timing_offset(x, args.timing_offset)
    if args.cfo_hz:
        x = carrier_offset(x, args.cfo_hz)
    if args.snr is not None:
        x = awgn(x, args.snr, np.random.default_rng(0))

    out = sys.stdout.buffer if args.output == "-" else open(args.output,
                                                            "wb")
    if args.format == "u8":
        out.write(quantize_u8(x).tobytes())
    else:
        out.write(x.astype(np.complex64).tobytes())
    out.flush()
    if args.output != "-":
        out.close()
    log.info("wrote %d samples (%.2f s at %.3f Msps)", x.size,
             x.size / C.SAMPLE_RATE, C.SAMPLE_RATE / 1e6)
    return 0


if __name__ == "__main__":
    sys.exit(main())
