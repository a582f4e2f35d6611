from .benchmark import ALL_BENCHMARKS, SRBenchmark
from .div2k import DIV2K
from .provider import Provider
from .synthetic import create_synthetic_dataset

__all__ = [
    "ALL_BENCHMARKS",
    "SRBenchmark",
    "DIV2K",
    "Provider",
    "create_synthetic_dataset",
]
