"""Golden-vector DAB modulator + host reference FEC (test fixtures, N17).

The reference project had no test suite (SURVEY.md s4); this NumPy,
standard-exact Mode I modulator gives every receiver stage an exact inverse
test without needing live captures, plus calibrated impairments (AWGN, CFO,
timing offset) for robustness sweeps.
"""

from dabtools_tpu.mod.convcode import conv_encode, viterbi_decode_ref  # noqa: F401
from dabtools_tpu.mod.modulator import Modulator, SubchannelSource  # noqa: F401
