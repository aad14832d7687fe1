"""Hardware validation harness for the flaky TPU relay on this machine.

``python tools/hwcheck.py <check> [args]`` runs ONE check in this process
(first paying the relay's first-fetch stall); ``python tools/hwcheck.py
--loop <check> [--budget S]`` re-runs it in fresh subprocesses until it
succeeds or the budget expires — the relay serves UNIMPLEMENTED / multi-
minute stalls in windows (observed: even ``jnp.zeros(8)`` fails), and a
fresh process with a fresh backend connection is the reliable recovery.

Checks:
  weather      classify the current relay window: tunnel, fetch, fresh
               compile, 32 MB transfer, execution, and whether
               block_until_ready can be trusted (JSON verdict)
  probe        trivial compile+fetch round trip (relay health)
  closedloop   modulated flagship mux decodes BIT-EXACT on the chip
  channelizer  fft + direct channelizer methods execute and agree on HW
  viterbi      pallas radix-2/radix-4 vs XLA on HW: bit-equality + timing
  config1      sustained full-ensemble decode, pallas vs xla viterbi
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Relay-facing process: opt in to retrying the relay's ValueError/
# RuntimeError disguises (see dabtools_tpu/utils/retry.py).
os.environ.setdefault("DABTOOLS_RELAY_ERRORS", "1")


def error_line(lines: list[str]) -> str:
    """The most informative line of a failed run's output: JAX appends a
    'For simplicity...' traceback-filtering notice AFTER the real error,
    so 'last line' alone is useless — prefer the last Error/assert line."""
    for l in reversed(lines):
        if ("Error" in l or "assert" in l) and "JAX_TRACEBACK" not in l:
            return l.strip()[:160]
    return lines[-1][:160] if lines else ""


def _warmup():
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.zeros(8))())
    dt = time.perf_counter() - t0
    if dt > 5:
        print(f"# warmup (first fetch) took {dt:.0f}s", flush=True)
    return dt


def check_probe():
    dt = _warmup()
    print(f"probe ok ({dt:.1f}s)")


def _step_with_watchdog(fn, seconds=90.0):
    """Run a relay-touching step in a daemon thread: fetch-hanging
    windows block forever without raising, and a weather classifier
    that hangs in the weather it classifies is useless.  Returns the
    step's value, or 'HANG (>Ns)'."""
    import threading
    box = {}

    def _run():
        try:
            box["v"] = fn()
        except Exception as e:  # noqa: BLE001
            box["v"] = f"FAIL: {str(e)[:60]}"

    th = threading.Thread(target=_run, daemon=True)
    th.start()
    th.join(seconds)
    return box.get("v", f"HANG (>{seconds:.0f}s)")


def check_weather():
    """One JSON object describing what works in the current window.

    `but_trustworthy` is the big one: this relay has been observed to
    acknowledge block_until_ready at ENQUEUE (21.5 TFLOP "done" in
    0.2 ms); when False, only fetch-forced timings mean anything."""
    import socket

    import jax
    import jax.numpy as jnp
    rep = {"platform": None, "tunnel_8083": False, "tiny_fetch_s": None,
           "fresh_compile_s": None, "put_32mb_s": None,
           "exec_chain_s": None, "but_chain_s": None,
           "but_trustworthy": None}
    try:
        s = socket.socket()
        s.settimeout(2)
        s.connect(("127.0.0.1", 8083))
        s.close()
        rep["tunnel_8083"] = True
    except OSError:
        pass
    rep["platform"] = jax.devices()[0].platform

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    rep["tiny_fetch_s"] = _step_with_watchdog(
        lambda: timed(lambda: np.asarray(jax.jit(lambda: jnp.zeros(8))())))
    c = float(int(time.time() * 1e3) % 100003)
    rep["fresh_compile_s"] = _step_with_watchdog(
        lambda: timed(lambda: jax.block_until_ready(
            jax.jit(lambda v: (v * c).sum())(jnp.ones(4096)))))
    rep["put_32mb_s"] = _step_with_watchdog(
        lambda: timed(lambda: jax.device_put(
            np.zeros(1 << 25, np.uint8)).block_until_ready()))

    def chain_step():
        @jax.jit
        def chain(a):
            def body(i, x):
                return jnp.tanh(x @ x) * 0.999
            return jax.lax.fori_loop(0, 2000, body, a)
        y = jnp.asarray(np.random.default_rng(0).normal(
            size=(1024, 1024)).astype(np.float32))
        jax.block_until_ready(chain(y))          # compile
        t0 = time.perf_counter()
        out = chain(y)
        jax.block_until_ready(out)
        but_s = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        float(np.asarray(jnp.sum(out)))          # fetch forces execution
        return but_s, round(but_s + time.perf_counter() - t0, 4)

    r = _step_with_watchdog(chain_step, seconds=150)
    if isinstance(r, tuple):
        rep["but_chain_s"], rep["exec_chain_s"] = r
        # 2000 serial 1024^3 matmuls = 4.3 TFLOP: sub-10ms
        # block_until_ready cannot be an execution signal
        rep["but_trustworthy"] = rep["but_chain_s"] > 0.01
    else:
        rep["exec_chain_s"] = r
    print(json.dumps(rep))


def check_closedloop():
    import jax
    _warmup()
    from __graft_entry__ import _flagship_ensemble
    from dabtools_tpu.eti.parse import EtiParser
    from dabtools_tpu.models.receiver import DabReceiver
    from tests.test_closed_loop import modulate

    ens = _flagship_ensemble()
    x, payload_bytes = modulate(ens, 20, seed=0)
    rx = DabReceiver(n_frames=16, ensemble=ens)
    t0 = time.perf_counter()
    eti = rx.feed(x)
    frames = list(EtiParser().feed(b"".join(eti)))
    a = rx._activation_cif
    subids = sorted(payload_bytes)
    good = sum(
        all(f.subchannel_data(sc) == payload_bytes[sc][a + k].tobytes()
            for sc in subids)
        for k, f in enumerate(frames))
    status = "BIT-EXACT" if good == len(frames) and frames else "MISMATCH"
    print(f"closedloop {status}: {good}/{len(frames)} ETI frames x "
          f"{len(subids)} subchannels on {jax.devices()[0].device_kind} "
          f"({time.perf_counter() - t0:.1f}s incl. compile)")
    assert status == "BIT-EXACT"


def check_channelizer():
    _warmup()
    import jax.numpy as jnp
    from dabtools_tpu.ops.fir import Channelizer

    fs = 16_384_000
    offsets = [(-3 + k) * 1_712_000 for k in range(7)]
    rng = np.random.default_rng(0)
    z = rng.normal(size=(fs // 8, 2)).astype(np.float32) * 0.3
    wide = (z[:, 0] + 1j * z[:, 1]).astype(np.complex64)
    outs = {}
    for method in ("fft", "direct"):
        ch = Channelizer(fs, offsets_hz=offsets, method=method)
        t0 = time.perf_counter()
        y = np.asarray(ch(wide))
        print(f"channelizer[{method}] ok on HW: out {y.shape} "
              f"({time.perf_counter() - t0:.1f}s incl. compile)", flush=True)
        outs[method] = y
    n = min(outs["fft"].shape[1], outs["direct"].shape[1])
    err = np.max(np.abs(outs["fft"][:, :n] - outs["direct"][:, :n]))
    scale = np.max(np.abs(outs["direct"][:, :n])) or 1.0
    print(f"channelizer fft-vs-direct max rel err {err / scale:.2e}")
    assert err / scale < 1e-3


def check_viterbi():
    import jax
    import jax.numpy as jnp
    _warmup()
    from dabtools_tpu.mod.convcode import conv_encode
    from dabtools_tpu.ops.viterbi import viterbi_decode
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, size=(576, 3072), dtype=np.uint8)
    soft = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
    soft = jnp.asarray(soft + rng.normal(scale=0.5, size=soft.shape),
                       dtype=jnp.float32)
    steps = 576 * 3078
    ref = None
    for impl in ("xla", "pallas"):
        f = jax.jit(lambda s, i=impl: viterbi_decode(s, impl=i))
        bits, metric = jax.block_until_ready(f(soft))
        # sustained: queue 10, then fetch a scalar of the LAST output
        # (block_until_ready alone is not an execution signal here)
        t0 = time.perf_counter()
        outs = [f(soft) for _ in range(10)]
        float(np.asarray(jnp.sum(outs[-1][1])))
        t = (time.perf_counter() - t0) / 10
        bits = np.asarray(bits)
        assert (bits == msgs).all(), f"{impl} decoded wrong bits"
        if ref is None:
            ref = bits
        else:
            assert (bits == ref).all(), "pallas != xla on HW"
        print(f"viterbi[{impl}] (576x3078): {t * 1e3:.2f} ms sustained "
              f"({steps / t / 1e6:.0f} Msteps/s), bits correct", flush=True)


def check_config1():
    import jax
    import jax.numpy as jnp
    _warmup()
    from __graft_entry__ import _flagship_ensemble
    from dabtools_tpu import constants as C
    from dabtools_tpu.models.receiver import block_samples, process_block
    from dabtools_tpu.ops import viterbi as V
    from dabtools_tpu.ops.fec import init_deinterleave_ring

    ens = _flagship_ensemble()
    n_frames = 16
    rng = np.random.default_rng(0)
    z = rng.normal(size=(block_samples(n_frames), 2)).astype(np.float32) * .3
    x = jnp.asarray(z[:, 0] + 1j * z[:, 1], dtype=jnp.complex64)
    rings = jax.device_put({
        str(s.subchid): init_deinterleave_ring(s.profile.tx_bits)
        for s in ens.subchannels})
    cif = jnp.asarray(0, dtype=jnp.int32)
    for impl in ("pallas", "xla"):
        V.force_impl(impl)
        process_block.clear_cache()
        t0 = time.perf_counter()
        jax.block_until_ready(process_block(
            x, rings, cif, ensemble=ens, n_frames=n_frames))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [process_block(x, rings, cif, ensemble=ens,
                              n_frames=n_frames) for _ in range(20)]
        float(np.asarray(jnp.sum(outs[-1][0]["fic_metric"])))  # force exec
        t = (time.perf_counter() - t0) / 20
        rt = n_frames * C.MODE_I.frame_size / t / C.SAMPLE_RATE
        print(f"config1[viterbi={impl}]: {t * 1e3:.2f} ms/block sustained "
              f"= {rt:.0f}x real-time (compile {compile_s:.0f}s)",
              flush=True)
    V.force_impl(None)


CHECKS = {"weather": check_weather, "probe": check_probe, "closedloop": check_closedloop,
          "channelizer": check_channelizer, "viterbi": check_viterbi,
          "config1": check_config1}


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    if args[0] == "--loop":
        name = args[1]
        budget = 3600.0
        if "--budget" in args:
            budget = float(args[args.index("--budget") + 1])
        t0 = time.perf_counter()
        attempt = 0
        while time.perf_counter() - t0 < budget:
            attempt += 1
            left = budget - (time.perf_counter() - t0)
            try:
                r = subprocess.run(
                    [sys.executable, __file__, name],
                    timeout=min(900, left), capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                print(f"# attempt {attempt}: timeout", flush=True)
                continue
            tail = (r.stdout + r.stderr).strip().splitlines()
            tail = [l for l in tail if not l.startswith("WARNING")]
            if r.returncode == 0:
                print("\n".join(l for l in tail if not l.startswith("#")))
                print(f"# succeeded on attempt {attempt} "
                      f"({time.perf_counter() - t0:.0f}s elapsed)")
                return 0
            print(f"# attempt {attempt} rc={r.returncode}: "
                  f"{error_line(tail)}", flush=True)
            time.sleep(30)
        print(f"# FAILED: budget {budget:.0f}s exhausted")
        return 1
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    CHECKS[args[0]]()
    return 0


if __name__ == "__main__":
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    sys.exit(main())
