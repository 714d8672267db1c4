"""Auxiliary subsystems: checkpointing, telemetry, profiling.

The reference has none of these (SURVEY.md §5: no tracing, no checkpoint,
no metrics — only the `telemetry_cb` hook slot); they are new obligations for
a production TPU framework.
"""
from .checkpoint import CheckpointManager, restore_checkpoint, save_checkpoint
from .deltackpt import (DeltaCheckpointManager, DeltaFollower, FlatRowLayout,
                        ModRowLayout, TouchedRowTracker, apply_delta,
                        load_base_data, snapshot_delta)
from .rowstats import (FrequencyTracker, evict_rows, evict_rows_sharded,
                       inverse_permutation, relayout, remap_batch,
                       reset_rows_state)
from .telemetry import (Telemetry, get_telemetry, phase, set_telemetry,
                        trace_profile)

__all__ = [
    "CheckpointManager", "save_checkpoint", "restore_checkpoint",
    "DeltaCheckpointManager", "TouchedRowTracker", "snapshot_delta",
    "apply_delta",
    "Telemetry", "get_telemetry", "set_telemetry", "phase", "trace_profile",
]
