"""Host-side utilities: CRCs, energy-dispersal PRBS, bit packing.

The byte-twiddling hot paths have C implementations in
``dabtools_tpu/native`` (loaded via ctypes, see ``utils.native``) with pure
NumPy fallbacks kept behaviourally identical and cross-tested.
"""

from dabtools_tpu.utils.crc import crc16_ccitt, crc16_ok, firecode  # noqa: F401
from dabtools_tpu.utils.prbs import energy_dispersal_bits  # noqa: F401
from dabtools_tpu.utils.bits import (  # noqa: F401
    bits_to_bytes,
    bytes_to_bits,
)
