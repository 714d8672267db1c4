"""Input pipeline runtime: native parsing, native synthesis, prefetch."""
from .loader import (CriteoFileLoader, DevicePrefetcher, PrefetchLoader,
                     native_available, native_parse_batch, parallel_batches)
from .synth import NativeSyntheticCriteo, native_synth_available

__all__ = ["CriteoFileLoader", "DevicePrefetcher", "PrefetchLoader",
           "native_available", "native_parse_batch", "parallel_batches",
           "NativeSyntheticCriteo", "native_synth_available"]
