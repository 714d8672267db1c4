"""embeddingtables_tpu — TPU-native embedding-table engine.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
darchr/EmbeddingTables.jl (reference mounted at /root/reference; blueprint in
/root/repo/SURVEY.md): fast non-reducing and sum-reducing (multi-hot)
embedding lookups, lazy sparse gradients (`(delta, indices)` cotangents that
never materialize a table-sized dense gradient), deduplicating fused-SGD
sparse updates, ensemble (multi-table) lookup with concat fusion for
DLRM-style models, and mesh-sharded tables with all-to-all index/result
exchange.

Layout convention: tables are row-major `(vocab, dim)` with the feature dim
last (TPU lane dimension); the reference is column-major `(dim, vocab)`.
`lookup(A, I)[i, :] == A[I[i], :]`.
"""
from . import config
from .types import (Dynamic, Forward, IndexingContext, NoContext, Static,
                    TableSpec, Update, cdiv, featuresize)
from .tables import (SimpleEmbedding, SplitEmbedding, as_table, destination,
                     example, is_table)
from .offload import HostOffloadEmbedding
from .quant import Int4QuantizedEmbedding, QuantizedEmbedding
from .qr import QREmbedding, qr_lookup_vjp
from .md import MDEmbedding, md_lookup_vjp
from .tt import TTEmbedding, tt_lookup_vjp
from .tiered import TieredEmbedding
from .rounding import stochastic_cast, stochastic_round_to_bf16
from .interop import (from_torch, stacked_from_torch, stacked_to_torch,
                      to_torch_embedding)
from .serving import (MicroBatcher, make_dcn_service, make_dlrm_service,
                      make_retrieval_service, serve_http)
from .rpc import ModelRouter, RPCClient, RPCServer, serve_rpc
from .ops import (AbstractExecutionStrategy, DefaultStrategy, DenseIndexer,
                  Indexer, IndexerResult, IndexerView, PreallocationStrategy,
                  SimpleParallelStrategy, Slicer, SparseEmbeddingUpdate,
                  SparseIndexer, StackedTables, accumulate_updates,
                  effective_weights, ensemble_sgd_update, ensemble_update,
                  flatten_indices, index, indexer_view, lookup, lookup_oracle,
                  lookup_vjp, maplookup, maplookup_vjp, normalize_indices,
                  normalize_weights, sgd_update, uncompress)

__version__ = "0.1.0"

__all__ = [
    # types
    "Static", "Dynamic", "TableSpec", "IndexingContext", "NoContext",
    "Forward", "Update", "featuresize", "cdiv",
    # tables
    "SimpleEmbedding", "SplitEmbedding", "HostOffloadEmbedding",
    "QuantizedEmbedding", "Int4QuantizedEmbedding", "QREmbedding", "qr_lookup_vjp", "MDEmbedding",
    "md_lookup_vjp", "TTEmbedding", "tt_lookup_vjp", "TieredEmbedding",
    "as_table", "example", "destination", "is_table",
    # lookup
    "lookup", "lookup_oracle", "lookup_vjp",
    # ensemble
    "maplookup", "maplookup_vjp", "AbstractExecutionStrategy",
    "DefaultStrategy", "SimpleParallelStrategy", "PreallocationStrategy",
    "StackedTables", "Slicer", "normalize_indices", "normalize_weights",
    "effective_weights",
    # indexer
    "Indexer", "SparseIndexer", "DenseIndexer", "IndexerResult", "IndexerView",
    "index", "indexer_view", "flatten_indices",
    # sparse update
    "SparseEmbeddingUpdate", "uncompress", "sgd_update", "ensemble_sgd_update",
    "ensemble_update", "accumulate_updates",
    # low-precision training
    "stochastic_cast", "stochastic_round_to_bf16",
    # torch interop
    "from_torch", "to_torch_embedding", "stacked_from_torch",
    "stacked_to_torch",
    # serving
    "MicroBatcher", "make_dcn_service", "make_dlrm_service",
    "make_retrieval_service",
    "serve_http", "ModelRouter", "RPCServer", "RPCClient", "serve_rpc",
    "config",
]
