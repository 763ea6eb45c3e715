"""Tracing / profiling utilities.

The reference's observability is wall-clock prints per epoch
(experiment.py:79-82) and progress prints. Here: structured per-stage
timers (JSON-exportable) + optional jax.profiler trace capture for
TensorBoard-compatible device profiles.

NOTE (axon/tunneled TPUs): ``jax.block_until_ready`` may return before
device execution finishes; ``StageTimer.sync`` forces a small host fetch
for honest walls.
"""
import contextlib
import json
import os
import time

import numpy as np


class StageTimer:
    """Accumulating named stage timer.

    with timer.stage('detect'):
        ... work ...
    timer.summary() -> {'detect': {'total_s': ..., 'calls': ...}, ...}
    """

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name, sync_result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_result is not None:
                self.sync(sync_result)
            dt = time.perf_counter() - t0
            rec = self.stages.setdefault(name, {'total_s': 0.0, 'calls': 0})
            rec['total_s'] += dt
            rec['calls'] += 1

    @staticmethod
    def sync(result):
        """Force real completion of a jax computation (see module note)."""
        leaf = result
        while isinstance(leaf, (tuple, list, dict)):
            leaf = (list(leaf.values()) if isinstance(leaf, dict)
                    else list(leaf))[0]
        if hasattr(leaf, 'shape') and hasattr(leaf, 'dtype'):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)

    def summary(self):
        return {k: dict(v) for k, v in self.stages.items()}

    def report(self):
        lines = []
        for name, rec in sorted(self.stages.items(),
                                key=lambda kv: -kv[1]['total_s']):
            lines.append(f"{name:24} {rec['total_s']:8.3f}s "
                         f"({rec['calls']} calls)")
        return '\n'.join(lines)

    def dump(self, fname):
        with open(fname, 'w') as f:
            json.dump(self.summary(), f, indent=1)


@contextlib.contextmanager
def device_trace(log_dir):
    """Capture a jax.profiler device trace (viewable in TensorBoard /
    Perfetto). No-op if the profiler is unavailable on the platform."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:          # tunneled platforms may not support it
        print(f'(device trace unavailable: {e})')
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
