"""``dabscan``: find DAB ensembles in a wideband capture.

Channelizes every Band III block that fits inside the capture bandwidth
(N2) and runs FIC acquisition on each candidate (capability beyond the
single-block reference — one TPU pass scans a whole band segment).

Usage:
  python -m dabtools_tpu.cli.dabscan --center 184.5e6 --rate 8.192e6 cap.cf32
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger("dabtools_tpu.dabscan")


def main(argv=None) -> int:
    from dabtools_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()   # fast, weather-proof startup
    p = argparse.ArgumentParser(prog="dabscan", description=__doc__)
    p.add_argument("input", help="wideband IQ capture (u8 or cf32), '-' stdin")
    p.add_argument("--center", type=float, required=True,
                   help="capture centre frequency, Hz")
    p.add_argument("--rate", type=float, required=True,
                   help="capture sample rate, Hz (integer multiple of "
                        "2.048 MHz)")
    p.add_argument("--format", choices=("u8", "s8", "s16", "cf32"),
                   default="cf32",
                   help="u8: RTL-SDR; s8: HackRF; s16: Airspy/SDRplay; "
                        "cf32: complex64")
    p.add_argument("--seconds", type=float, default=2.0,
                   help="how much capture to scan")
    p.add_argument("--json", action="store_true",
                   help="machine-readable output: one JSON object per "
                        "candidate block on stdout")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from dabtools_tpu.ops.fir import Channelizer
    from dabtools_tpu.tables.bandiii import blocks_within

    fs = int(args.rate)
    candidates = blocks_within(args.center, fs)
    if not candidates:
        print("no Band III blocks inside the capture bandwidth")
        return 1
    offsets = [int(f - args.center) for _, f in candidates]
    print(f"scanning {len(candidates)} blocks: "
          f"{', '.join(l for l, _ in candidates)}", file=sys.stderr)

    from dabtools_tpu.cli.dab2eti import _FORMATS, decode_iq
    n = int(args.seconds * fs)
    f = sys.stdin.buffer if args.input == "-" else open(args.input, "rb")
    x = decode_iq(f.read(_FORMATS[args.format] * n), args.format)
    if x.dtype == np.uint8:
        from dabtools_tpu.mod.impairments import u8_to_complex
        x = u8_to_complex(x)
    if args.input != "-":
        f.close()

    ch = Channelizer(fs, offsets_hz=offsets)
    streams = ch(x)

    # All candidate blocks run FIC acquisition as ONE channel-parallel
    # device call (N13), then the per-block FIG parse happens on host.
    from dabtools_tpu.models.receiver import block_samples
    from dabtools_tpu.parallel.channel import channel_parallel_block
    from dabtools_tpu.fic.fig import FigParser
    from dabtools_tpu.utils.crc import crc16_ok
    import jax
    import jax.numpy as jnp

    from dabtools_tpu import constants as C
    n_frames = max(1, min(8, streams.shape[1]
                          // (2 * C.MODE_I.frame_size) - 1))
    need = block_samples(n_frames)
    if streams.shape[1] < need:
        print(f"capture too short: need {need} samples per block after "
              f"channelization, have {streams.shape[1]}", file=sys.stderr)
        return 1
    from dabtools_tpu.utils.retry import call_with_retries
    out, _, _ = call_with_retries(
        channel_parallel_block,
        jnp.asarray(streams[:, :need]), {}, jnp.asarray(0, jnp.int32),
        ensemble=None, n_frames=n_frames)
    out = call_with_retries(jax.device_get, out)
    fib_bytes_all = np.asarray(out["fib_bytes"])    # (C, B, 12, 32)
    null_ratio = np.asarray(out["null_ratio"])
    # PRS channel sounding per block (SFN/multipath view): us RMS.
    delay_us = (np.asarray(out["delay_spread"]).mean(axis=1)
                * 1e6 / C.SAMPLE_RATE)

    import json

    from dabtools_tpu.ops.sync import (
        SNR_CAVEAT,
        SNR_METHOD,
        null_ratio_to_snr_db,
    )

    def snr_db(r):
        return round(null_ratio_to_snr_db(r), 1)

    found = 0
    for c, (label, freq) in enumerate(candidates):
        fig = FigParser()
        fibs = fib_bytes_all[c]
        for f in range(fibs.shape[0]):
            for i in range(fibs.shape[1]):
                fib = fibs[f, i].tobytes()
                if crc16_ok(fib):
                    fig.feed_fib(fib)
        ens = fig.ensemble()
        if ens is None:
            if args.json:
                print(json.dumps({"block": label, "freq_hz": freq,
                                  "null_ratio": float(null_ratio[c]),
                                  "snr_db": snr_db(null_ratio[c]),
                                  "snr_method": SNR_METHOD,
                                  "snr_caveat": SNR_CAVEAT}))
            else:
                print(f"{label} {freq / 1e6:8.3f} MHz: -- "
                      f"(null ratio {float(null_ratio[c]):.2f})")
            continue
        found += 1
        if args.json:
            print(json.dumps({
                "block": label, "freq_hz": freq,
                "null_ratio": float(null_ratio[c]),
                "snr_db": snr_db(null_ratio[c]),
                "snr_method": SNR_METHOD,
                "snr_caveat": SNR_CAVEAT,
                "delay_spread_us": round(float(delay_us[c]), 2),
                "eid": f"0x{ens.eid:04X}", "label": ens.label,
                "subchannels": len(ens.subchannels),
                "services": [
                    {"sid": f"0x{s.sid:X}", "label": s.label,
                     "dabplus": any(c.is_dabplus for c in s.components)}
                    for s in ens.services]}))
            continue
        svcs = ", ".join(
            f"{s.label or hex(s.sid)}"
            f"[{'DAB+' if any(c.is_dabplus for c in s.components) else 'MP2'}]"
            for s in ens.services) or "(no services signalled yet)"
        print(f"{label} {freq / 1e6:8.3f} MHz: ensemble 0x{ens.eid:04X} "
              f"{ens.label!r} — {len(ens.subchannels)} subch — "
              f"delay spread {float(delay_us[c]):.1f} us — {svcs}")
    print(f"{found} ensemble(s) found", file=sys.stderr)
    return 0 if found else 2


if __name__ == "__main__":
    sys.exit(main())
