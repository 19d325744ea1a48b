"""Data layer: processors, frame samplers, packing, datasets, loaders.

Importing this package registers the processors in the Registry (the
reference registers by star-import side effect too — train.py:28-32).
"""

from stllm_tpu.data import processors as _processors  # noqa: F401  (registry side effect)
