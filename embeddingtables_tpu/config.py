"""Global implementation-selection knobs.

The reference's tuning surface is type-level (`Static` vs `Dynamic`,
`Val(Nontemporal)`, `MAX_ACCUMULATOR_SIZE`, SURVEY.md §5 "Config"). Ours is a
small module-level config: which backend implements the hot ops ("auto" uses
XLA everywhere — the measured decision, docs/DESIGN.md §1b-§1d: XLA's
gather/scatter sit at the v5e DMA-issue floor and every Pallas per-row-DMA
structure tried costs 15-18 ns/copy in kernel-side overhead; the Pallas
kernels remain forceable here for other chips/shapes), and whether Pallas
kernels run in interpreter mode (CPU testing).
"""
from __future__ import annotations

import jax

_LOOKUP_IMPL = "auto"   # "auto" | "xla" | "pallas"
_UPDATE_IMPL = "auto"   # "auto" | "scatter" | "dedup" | "pallas"
_INTERPRET = None        # None = auto (interpret unless on real TPU)


def lookup_impl() -> str:
    return _LOOKUP_IMPL


def update_impl() -> str:
    return _UPDATE_IMPL


def set_lookup_impl(v: str) -> None:
    global _LOOKUP_IMPL
    assert v in ("auto", "xla", "pallas"), v
    _LOOKUP_IMPL = v


def set_update_impl(v: str) -> None:
    global _UPDATE_IMPL
    assert v in ("auto", "scatter", "dedup", "pallas"), v
    _UPDATE_IMPL = v


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (tests)."""
    if _INTERPRET is not None:
        return _INTERPRET
    return not on_tpu()


def set_pallas_interpret(v) -> None:
    global _INTERPRET
    _INTERPRET = v


class use_impl:
    """Context manager: temporarily force lookup/update implementations."""

    def __init__(self, lookup: str | None = None, update: str | None = None):
        self._lookup, self._update = lookup, update
        self._saved = None

    def __enter__(self):
        self._saved = (_LOOKUP_IMPL, _UPDATE_IMPL)
        if self._lookup is not None:
            set_lookup_impl(self._lookup)
        if self._update is not None:
            set_update_impl(self._update)
        return self

    def __exit__(self, *exc):
        set_lookup_impl(self._saved[0])
        set_update_impl(self._saved[1])
        return False
