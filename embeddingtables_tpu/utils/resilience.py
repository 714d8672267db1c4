"""Training resilience: divergence detection + rollback, auto-resume.

The reference is a single-process kernel library with no failure story
(SURVEY.md §5: "Failure detection / elastic recovery: none"); a production
TPU training service needs one. Two pieces, both built on the checkpoint
layer (utils/checkpoint.py):

  - `DivergenceGuard`: watches the loss stream; on non-finite loss (or a
    configurable spike factor) it restores the last good checkpoint and
    reports how many batches to skip — the standard DLRM recipe for loss
    blow-ups from hot-row collisions.
  - `resume_or_init`: standard auto-resume entry for preemptible workers:
    restore the latest checkpoint if one exists, else initialize fresh.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

from .checkpoint import CheckpointManager


@dataclasses.dataclass
class DivergenceGuard:
    """Loss-stream watchdog with checkpoint rollback.

    ckpt:          CheckpointManager holding known-good state.
    spike_factor:  a loss > spike_factor * running-mean counts as divergence
                   (None disables; non-finite always counts).
    patience:      consecutive bad losses tolerated before rolling back.
    """

    ckpt: Optional[CheckpointManager] = None
    spike_factor: Optional[float] = 10.0
    patience: int = 1
    ema: float = 0.98

    _mean: Optional[float] = dataclasses.field(default=None, init=False)
    _bad: int = dataclasses.field(default=0, init=False)
    rollbacks: int = dataclasses.field(default=0, init=False)

    def is_bad(self, loss: float) -> bool:
        if not math.isfinite(loss):
            return True
        if self.spike_factor is not None and self._mean is not None:
            return loss > self.spike_factor * max(self._mean, 1e-12)
        return False

    def observe(self, loss: float, model):
        """Feed one loss. Returns (model, rolled_back: bool) — `model` is the
        restored state when a rollback happened."""
        if self.is_bad(loss):
            self._bad += 1
            if self._bad >= self.patience:
                self._bad = 0
                if self.ckpt is not None and self.ckpt.latest_step() is not None:
                    restored = self.ckpt.restore_latest(model)
                    self.rollbacks += 1
                    return restored, True
                self.rollbacks += 1
                return model, True  # no checkpoint: caller should re-init/skip
            return model, False
        self._bad = 0
        self._mean = (loss if self._mean is None
                      else self.ema * self._mean + (1 - self.ema) * loss)
        return model, False


def resume_or_init(ckpt: CheckpointManager, init_fn: Callable[[], object],
                   template=None):
    """Restore the latest checkpoint (sharded restore if the template carries
    shardings), else initialize fresh. Returns (model, start_step)."""
    step = ckpt.latest_step()
    if step is None:
        return init_fn(), 0
    tmpl = template if template is not None else init_fn()
    return ckpt.restore(step, tmpl), step
