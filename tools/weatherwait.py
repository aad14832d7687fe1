"""Wait for a good relay window, then exec a command.

The TPU relay's bad windows (fresh compiles and >MB transfers fail
process-wide) last minutes to tens of minutes.  This tool polls a cheap
probe in a fresh subprocess (compile + 4 MB device_put + fetch) and
execs the given command once the probe passes.

Usage: python tools/weatherwait.py [--max-wait S] -- cmd args...
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Bench-grade probe, ONE source of truth (bench._PROBE_SRC): a FRESH
# compile (unique constant defeats the persistent cache) +
# headline-scale 32 MB H2D + fetch.  A cheaper 4 MB cached-jit probe
# green-lit windows where every fresh compile and big transfer failed
# (measured 2026-08-18; and 2026-08-20 it waved three ber_sweep runs
# into mid-sweep wedges); a hand-copied probe here drifted from
# bench's once already — import it instead.
from bench import _PROBE_SRC as PROBE  # noqa: E402


def probe_ok(timeout: int = 150) -> bool:
    try:
        return subprocess.run([sys.executable, "-c", PROBE],
                              capture_output=True,
                              timeout=timeout).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    args = sys.argv[1:]
    max_wait = 7200.0
    if args and args[0] == "--max-wait":
        try:
            max_wait = float(args[1])
        except (IndexError, ValueError):
            print(__doc__, file=sys.stderr)
            return 2
        args = args[2:]
    if args and args[0] == "--":
        args = args[1:]
    t0 = time.time()
    n = 0
    while time.time() - t0 < max_wait:
        n += 1
        if probe_ok():
            print(f"weather ok after {time.time() - t0:.0f}s "
                  f"({n} probes)", flush=True)
            if not args:
                return 0
            return subprocess.run(args).returncode
        print(f"probe {n} failed ({time.time() - t0:.0f}s); waiting 45s",
              flush=True)
        time.sleep(45)
    print("max-wait exhausted; weather still bad", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
