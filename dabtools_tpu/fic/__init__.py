"""FIC: FIG parsing/building and the ensemble configuration model (N9).

Host-side pure Python operating on decoded FIB bytes; the resulting frozen
``Ensemble`` dataclass is hashable and acts as the *static* argument that
shapes the jitted MSC decode (SURVEY.md s2b N9).
"""

from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel  # noqa: F401
from dabtools_tpu.fic.fig import FigParser, build_fibs_for_ensemble  # noqa: F401
