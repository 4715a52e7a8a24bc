"""Profiling and tracing helpers (the reference only has perf_counter
printouts — src/gen4eval_SD.py:239,260; here we expose XLA's own tooling)."""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def wallclock(label: str, sink=print):
    """perf_counter timing context (the reference's eval-shard timing)."""
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace (view with xprof/tensorboard-profile where
    available). Falls back to a no-op if the backend rejects tracing."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def compiled_stats(fn, *example_args) -> Optional[dict]:
    """Compile a callable and report XLA's cost analysis + memory analysis."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    out = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out["cost"] = dict(ca) if ca else {}
    except Exception:
        pass
    try:
        ma = compiled.memory_analysis()
        out["memory"] = {
            "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
            "argument_bytes": getattr(ma, "argument_size_in_bytes", None),
            "output_bytes": getattr(ma, "output_size_in_bytes", None),
        }
    except Exception:
        pass
    return out
