"""Pallas TPU kernels — the engine's native kernel library.

The reference's native performance layer is Julia-emitted LLVM (explicit SIMD,
nontemporal stores, loop metadata — `src/simd.jl`, `src/utils.jl:11-37`).
Its TPU-native equivalent is this package: compiled Mosaic kernels for the
three hot ops (gather, gather+bag-sum, dedup scatter-FMA), DMA-pipelined
against HBM with VMEM/VREG accumulation.
"""
