"""Profiling utilities.

  * ``timeit`` decorator/context keyed by TIMEIT=1 (reference
    gsplat/profile.py:11-59) — accumulates wall times with device sync.
  * ``honest_timer``: the relay-safe measurement loop — this remote-TPU
    setup reports async completion unreliably and adds a fixed dispatch tax
    after any device-to-host transfer, so real kernel time is measured by
    K-iteration scan differencing with a forced sync (see bench.py).
  * ``trace``: jax.profiler wrapper writing a Perfetto/TensorBoard trace
    (replaces the reference's torch.profiler integration,
    simple_trainer.py:53-83).
"""

from __future__ import annotations

import contextlib
import functools
import os
import time
from collections import defaultdict

import jax

TIMINGS = defaultdict(float)
COUNTS = defaultdict(int)


def _enabled() -> bool:
    return os.environ.get("TIMEIT", "0") == "1"


@contextlib.contextmanager
def timeit(name: str):
    if not _enabled():
        yield
        return
    t0 = time.perf_counter()
    yield
    # sync whatever is pending
    jax.effects_barrier()
    TIMINGS[name] += time.perf_counter() - t0
    COUNTS[name] += 1


def timeit_decorator(name=None):
    def deco(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*a, **kw):
            with timeit(label):
                return fn(*a, **kw)

        return wrapper

    return deco


def report():
    for k in sorted(TIMINGS):
        print(f"{k:40s} {TIMINGS[k]:9.3f}s  x{COUNTS[k]}")


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def honest_timer(body, args=(), K: int = 8, repeats: int = 3):
    """Per-iteration seconds for ``body(carry, *args)->carry`` measured by
    scan differencing (K vs 1) with forced host sync.

    IMPORTANT: pass every big array through ``args`` — arrays merely closed
    over by ``body`` become jit constants, which this remote-TPU relay
    re-stages on every dispatch (seconds of hidden overhead for 100MB+
    scenes)."""
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def run(x, *a):
            def step(c, _):
                return body(c, *a), None

            c, _ = jax.lax.scan(step, x, None, length=k)
            return c

        x = jnp.float32(1e-12)
        _ = float(run(x, *args))
        best = 1e9
        for _ in range(repeats):
            t0 = time.perf_counter()
            _ = float(run(x, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run_k(1), run_k(K)
    return (tk - t1) / (K - 1)
