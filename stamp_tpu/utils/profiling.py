"""Tracing / profiling subsystem (SURVEY.md §5.1 — a capability the
reference lacks; it only has tqdm progress bars).

Two layers:

* ``stage(name)`` — a nestable wall-clock stage timer.  Pipeline code brackets
  its phases (tile decode, device forward, h5 write, train epoch, …); the
  accumulated table is logged at the end of a profiled run, giving the
  per-stage breakdown that perf work starts from.
* ``device_trace(out_dir)`` — a ``jax.profiler`` trace (XPlane protos under
  ``<out_dir>/profile``, viewable in TensorBoard/xprof) around the whole
  command, guarded so environments whose backend cannot trace (e.g. remote
  relays) degrade to stage timing only.

Activated by ``stamp --profile <command>``; always-on use is also fine — an
inactive timer costs one dict lookup per stage.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict
from pathlib import Path

_logger = logging.getLogger("stamp")


class StageTimer:
    """Accumulates wall-clock time per named stage (thread-safe)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.seconds: dict[str, float] = defaultdict(float)
        self.calls: dict[str, int] = defaultdict(int)
        self.enabled = False

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.seconds[name] += dt
                self.calls[name] += 1

    def reset(self) -> None:
        with self._lock:
            self.seconds.clear()
            self.calls.clear()

    def report(self) -> str:
        if not self.seconds:
            return "no stages recorded"
        width = max(len(n) for n in self.seconds)
        total = sum(self.seconds.values())
        lines = [f"{'stage':<{width}}  {'calls':>7}  {'total s':>9}  {'share':>6}"]
        for name, secs in sorted(self.seconds.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name:<{width}}  {self.calls[name]:>7d}  {secs:>9.2f}  "
                f"{secs / total:>6.1%}"
            )
        return "\n".join(lines)


#: process-global timer used by the pipeline stages
timer = StageTimer()
stage = timer.stage


@contextlib.contextmanager
def device_trace(out_dir: Path):
    """jax.profiler trace around a block; degrades gracefully if the backend
    cannot trace."""
    import jax

    trace_dir = Path(out_dir) / "profile"
    started = False
    try:
        jax.profiler.start_trace(str(trace_dir))
        started = True
        _logger.info(f"writing device trace to {trace_dir}")
    except Exception as e:  # relay backends may not support profiling
        _logger.warning(f"device tracing unavailable ({e}); stage timing only")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                _logger.warning(f"stopping device trace failed: {e}")


@contextlib.contextmanager
def profiled_run(out_dir: Path):
    """--profile wrapper: device trace + stage table into the log."""
    timer.enabled = True
    timer.reset()
    try:
        with device_trace(out_dir):
            yield
    finally:
        _logger.info("profile — per-stage wall time:\n" + timer.report())
        timer.enabled = False
