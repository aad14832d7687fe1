"""ETI(NI) framing: assembly (N10), parsing + sub-channel extraction (N11),
and the DAB+ superframe path (N12)."""

from dabtools_tpu.eti.assemble import EtiAssembler  # noqa: F401
from dabtools_tpu.eti.parse import EtiFrame, EtiParser  # noqa: F401
