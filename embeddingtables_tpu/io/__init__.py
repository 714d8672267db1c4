"""Input pipeline runtime: native parsing + background prefetch."""
from .loader import (CriteoFileLoader, PrefetchLoader, native_available,
                     native_parse_batch, parallel_batches)

__all__ = ["CriteoFileLoader", "PrefetchLoader", "native_available",
           "native_parse_batch", "parallel_batches"]
