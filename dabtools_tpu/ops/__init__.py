"""Device-side signal ops (JAX/XLA + Pallas): the receiver compute path.

Design rules (SURVEY.md s7): fixed shapes everywhere, pure functions over
blocks of frames, `lax.scan` for the sequential pieces (Viterbi trellis,
time-deinterleaver ring), static gather maps from ``dabtools_tpu.tables``.
"""

from dabtools_tpu.ops.viterbi import viterbi_decode  # noqa: F401
from dabtools_tpu.ops.fec import (  # noqa: F401
    depuncture,
    descramble,
    time_deinterleave,
)
from dabtools_tpu.ops.ofdm import demod_frames  # noqa: F401
from dabtools_tpu.ops.sync import (  # noqa: F401
    coarse_null_sync,
    fine_sync_prs,
    fractional_cfo,
)
