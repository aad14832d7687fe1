"""Static DAB tables: puncturing profiles, frequency interleaving, PRS.

Everything here is plain NumPy computed at import/trace time; the receiver
and modulator gather/scatter with these as *constant* index maps so XLA sees
only static shapes (reference counterparts: `upstream:dab_tables.c`,
`upstream:input_sdr.c` table-init code, `upstream:sdr_prstab.c`).
"""

from dabtools_tpu.tables.puncturing import (  # noqa: F401
    PuncturingProfile,
    eep_profile,
    fic_puncture_mask,
    profile_for_subchannel,
    puncture_mask_for_profile,
    uep_profile,
)
from dabtools_tpu.tables.freq_interleave import freq_interleave_map  # noqa: F401
from dabtools_tpu.tables.prs import prs_carriers, prs_time  # noqa: F401
