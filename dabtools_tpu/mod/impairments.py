"""Channel impairments for robustness testing (SURVEY.md s4 item 1).

All operate on complex baseband at 2.048 Msps and are deterministic given a
``numpy.random.Generator``.
"""

from __future__ import annotations

import numpy as np

from dabtools_tpu.constants import SAMPLE_RATE


def awgn(x: np.ndarray, snr_db: float,
         rng: np.random.Generator) -> np.ndarray:
    """Add complex AWGN at the given SNR relative to the mean signal power."""
    power = float(np.mean(np.abs(x) ** 2))
    noise_power = power / (10 ** (snr_db / 10))
    noise = rng.normal(scale=np.sqrt(noise_power / 2), size=(x.size, 2))
    return (x + noise[:, 0] + 1j * noise[:, 1]).astype(np.complex64)


def carrier_offset(x: np.ndarray, cfo_hz: float,
                   sample_rate: float = SAMPLE_RATE,
                   start_sample: int = 0) -> np.ndarray:
    """Apply a carrier-frequency offset (rotates at cfo_hz).

    ``start_sample`` keeps the rotation phase-continuous when a long
    stream is processed in chunks (pass the running sample count)."""
    n = np.arange(start_sample, start_sample + x.size, dtype=np.float64)
    return (x * np.exp(2j * np.pi * cfo_hz * n / sample_rate)).astype(
        np.complex64)


def timing_offset(x: np.ndarray, samples: int) -> np.ndarray:
    """Delay the stream by ``samples`` (prepends zeros)."""
    if samples < 0:
        return x[-samples:]
    return np.concatenate([np.zeros(samples, dtype=np.complex64), x])


def amplitude(x: np.ndarray, gain: float) -> np.ndarray:
    return (x * gain).astype(np.complex64)


def quantize_u8(x: np.ndarray, scale: float = 64.0) -> np.ndarray:
    """Round-trip through RTL-SDR-style unsigned 8-bit IQ (offset 128)."""
    iq = np.empty(2 * x.size, dtype=np.float32)
    iq[0::2], iq[1::2] = x.real, x.imag
    u8 = np.clip(np.round(iq * scale + 128.0), 0, 255).astype(np.uint8)
    return u8


def u8_to_complex(u8: np.ndarray, scale: float = 64.0) -> np.ndarray:
    f = (u8.astype(np.float32) - 128.0) / scale
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
