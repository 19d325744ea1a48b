"""stllm_tpu: TPU-native video-LLM framework (ST-LLM capabilities, JAX/XLA/Pallas)."""

__version__ = "0.1.0"

import os as _os

from stllm_tpu.common.registry import registry

_root = _os.path.dirname(_os.path.abspath(__file__))
registry.register_path("library_root", _root)
registry.register_path("repo_root", _os.path.dirname(_root))
registry.register_path("cache_root", _os.environ.get("STLLM_CACHE", _os.path.join(_os.path.dirname(_root), ".cache")))
registry.register("MAX_INT", 2**31 - 1)
registry.register("SPLIT_NAMES", ["train", "val", "test"])
