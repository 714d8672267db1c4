"""Pallas TPU kernels — the engine's native kernel library.

The reference's native performance layer is Julia-emitted LLVM (explicit SIMD,
nontemporal stores, loop metadata — `src/simd.jl`, `src/utils.jl:11-37`).
Its TPU-native equivalent is this package: compiled Mosaic kernels for the
hot ops — gather (`gather.py`), gather+bag-sum (`gather.py`), the sorted
run-scatter (`scatter.py`), and the MXU one-hot segment-accumulate
(`segsum.py`, the only structure measured to absorb duplicate ids below
XLA-scatter cost on a TensorCore-only chip) — DMA-pipelined against HBM
with VMEM/VREG/MXU accumulation. Which kernel is the production path on
which hardware is a MEASURED decision recorded in docs/DESIGN.md; on v5e,
XLA's native gather/scatter win the full-vocab cases and `config`'s "auto"
dispatch reflects that.
"""
