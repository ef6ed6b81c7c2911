"""Stage progress and timing.

The reference's only observability is tqdm bars per pipeline stage
(/root/reference/meshflowstabilizer.py:198, :276, :693, :998, :1190, :1317).
This provides the same user-visible stage progress plus wall-clock capture
and optional jax.profiler traces.

Enable timing report: MESHFLOW_TIMINGS=1 (prints a per-stage table).
Enable device traces: MESHFLOW_TRACE_DIR=/path (TensorBoard trace per run).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

class StageTimer:
    """Collects per-stage wall times for one stabilize() run."""

    def __init__(self, enabled: Optional[bool] = None):
        self.enabled = (
            enabled
            if enabled is not None
            else os.environ.get("MESHFLOW_TIMINGS", "") not in ("", "0")
        )
        self.trace_dir = os.environ.get("MESHFLOW_TRACE_DIR")
        self.stages: List[tuple] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        trace_ctx = contextlib.nullcontext()
        if self.trace_dir:
            import jax

            trace_ctx = jax.profiler.trace(
                os.path.join(self.trace_dir, name.replace(" ", "_"))
            )
        with trace_ctx:
            yield
        self.stages.append((name, time.perf_counter() - start))

    def report(self) -> Dict[str, float]:
        table = {name: seconds for name, seconds in self.stages}
        if self.enabled:
            total = sum(table.values())
            width = max((len(n) for n in table), default=0)
            for name, seconds in self.stages:
                print(f"  {name:<{width}}  {seconds:7.2f}s  ({100*seconds/max(total,1e-9):4.1f}%)")
            print(f"  {'total':<{width}}  {total:7.2f}s")
        return table
