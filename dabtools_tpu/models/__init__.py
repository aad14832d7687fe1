"""Receiver models: the end-to-end block pipelines (the "model zoo").

``DabReceiver`` is the flagship: IQ samples in, ETI(NI) bytes out —
the `dab2eti` equivalent (SURVEY.md s3.4).
"""

from dabtools_tpu.models.receiver import DabReceiver, process_block  # noqa: F401
