"""Tracing / profiling subsystem (SURVEY §5: absent in the reference).

Three tools:

- ``PhaseTimer`` — wall-clock accumulator for named pipeline phases
  (geometry / texture / export / checkpoint), written per run as
  ``timings.json`` next to ``metrics.jsonl``.
- ``device_trace`` — context manager around ``jax.profiler.trace`` gated on
  the ``TOPO4D_PROFILE_DIR`` env var (or an explicit logdir), producing
  XLA/TPU traces viewable in TensorBoard/Perfetto. A no-op when disabled or
  when the backend cannot trace (e.g. the tunneled test TPU).
- ``mpix_per_s`` — the throughput counter used by bench.py and the trainer
  (pixels pushed through forward+backward per second).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Accumulates wall-clock seconds per named phase.

    >>> timer = PhaseTimer()
    >>> with timer.phase("geometry"):
    ...     ...
    >>> timer.summary()["geometry"]["seconds"]
    """

    def __init__(self) -> None:
        self._total: Dict[str, float] = {}
        self._count: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._total[name] = self._total.get(name, 0.0) + dt
            self._count[name] = self._count.get(name, 0) + 1

    def add(self, name: str, seconds: float) -> None:
        self._total[name] = self._total.get(name, 0.0) + seconds
        self._count[name] = self._count.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "seconds": round(self._total[name], 4),
                "count": self._count[name],
                "mean_seconds": round(
                    self._total[name] / max(self._count[name], 1), 4
                ),
            }
            for name in sorted(self._total)
        }

    def write(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.summary(), fh, indent=2)

    def load(self, path: str) -> None:
        """Fold a previously written timings.json back in (resume path:
        the trainer rewrites the file whole, so without this a resumed
        run's profile silently drops the pre-resume frames)."""
        if not os.path.exists(path):
            return
        try:
            with open(path) as fh:
                prior = json.load(fh)
        except (json.JSONDecodeError, OSError):
            return  # torn file from a hard kill: start fresh
        for name, row in prior.items():
            self._total[name] = self._total.get(name, 0.0) + row["seconds"]
            self._count[name] = self._count.get(name, 0) + row["count"]


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None) -> Iterator[bool]:
    """Capture a jax.profiler trace when enabled; yields whether tracing.

    Enabled when ``logdir`` is given or ``TOPO4D_PROFILE_DIR`` is set.
    Trace failures (unsupported backend) degrade to a no-op rather than
    aborting a training run.
    """
    logdir = logdir or os.environ.get("TOPO4D_PROFILE_DIR")
    if not logdir:
        yield False
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
    except Exception as exc:  # backend without profiler support
        print(f"[topo4d] profiler trace unavailable: {exc}")
        yield False
        return
    try:
        yield True
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as exc:
            print(f"[topo4d] profiler stop_trace failed: {exc}")


def sync_value(x):
    """Hard synchronization point for timing loops; returns ``x``.

    ``jax.block_until_ready`` through the remote-execution tunnel can
    return before the device has executed (observed after the
    2026-08-20 tunnel outage: 25-step scans "completed" in 0.2 ms while
    a forced scalar download showed the real 30 ms). A device->host
    download of one element cannot be acknowledged early — the value
    must exist — so this pulls one element of the first array leaf,
    then returns the (now materialized) input like block_until_ready.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    flat = leaf.reshape(-1) if getattr(leaf, "ndim", 0) else leaf
    float(jax.device_get(flat[-1] if getattr(leaf, "ndim", 0) else flat))
    return x


def mpix_per_s(
    height: int, width: int, iterations: int, seconds: float
) -> float:
    """Throughput counter: Mpixels through fwd+bwd per second."""
    if seconds <= 0:
        return 0.0
    return height * width * iterations / seconds / 1e6
