from .params import LshConfig, LshParams, fit_params, load_params, save_params
from .coding import code_vectors, code_single
from .partitioner import build_partitions

__all__ = [
    "LshConfig", "LshParams", "fit_params", "load_params", "save_params",
    "code_vectors", "code_single", "build_partitions",
]
