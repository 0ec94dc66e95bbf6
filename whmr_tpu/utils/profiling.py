"""Profiling/observability helpers (SURVEY.md §5: the reference has none
beyond wall-clock FPS; here jax.profiler traces are first-class)."""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a Perfetto/XPlane trace of the enclosed block.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Step timing with device synchronization via scalar readback.

    NOTE: on async/tunnel platforms `block_until_ready` can be a no-op;
    time around a scalar `float(...)` readback of a value that depends on
    the computation (see .claude/skills/verify/SKILL.md).
    """

    def __init__(self):
        self.records: Dict[str, list] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {
            name: sum(v) / len(v) for name, v in self.records.items() if v
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


def device_memory_stats() -> Optional[Dict[str, int]]:
    """HBM usage snapshot where the backend exposes it."""
    try:
        stats = jax.devices()[0].memory_stats()
        return {k: int(v) for k, v in stats.items()} if stats else None
    except (AttributeError, NotImplementedError):
        return None


def enable_compile_cache(path: str = "/tmp/whmr_jax_cache") -> None:
    """Persistent XLA compilation cache: first run compiles (slow on
    remote-compile hosts), reruns load from disk."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
