"""Parallelism layer (N13-N16): how this framework scales where the
single-threaded reference could not.

* ``channel``  — data-parallel: many independent ensembles/IQ streams
  sharded over a ``channels`` mesh axis (the DP analog).
* ``timeblock`` — sequence-parallel: one stream's time axis sharded across
  devices with ppermute halo exchange (the CP/ring analog); the 16-CIF
  deinterleaver dependency is absorbed by a warmup overlap in the halo.
* ``mesh``     — mesh construction + multihost init helpers (the
  NCCL-equivalent is JAX collectives over ICI/DCN; SURVEY.md s5.8).

TP/PP/EP have no honest counterpart here (no weight matrices, layers, or
experts to shard — SURVEY.md s2b); stated rather than faked.
"""

from dabtools_tpu.parallel.mesh import make_receiver_mesh  # noqa: F401
from dabtools_tpu.parallel.channel import channel_parallel_block  # noqa: F401
from dabtools_tpu.parallel.timeblock import timeblock_receiver  # noqa: F401
