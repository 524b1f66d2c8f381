"""Span-based tracing/profiling (the reference's tracing-subscriber analog).

The reference wraps every pipeline stage in `tracing` spans and prints
`time.busy` on span close (vimz/src/logging.rs:20-82, span usage in
vimz/src/sonobe_backend/folding.rs:30-67). Here:

- `span(name)` context manager / `@traced` decorator time a stage and log
  `{name}: {seconds}s` on close (nesting shown by indentation);
- enabled with VIMZ_LOG=info (or any non-empty value; default off, like the
  reference's RUST_LOG=warn default);
- all spans are also recorded in-process (`collected()`) so benchmark
  harnesses can attribute time per stage without parsing logs;
- `jax_profile(path)` wraps a block in the JAX/XLA device profiler for
  kernel-level speed-of-light analysis.
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager
from functools import wraps

_DEPTH = 0
_RECORS: list[tuple[str, float]] = []


def enabled() -> bool:
    return bool(os.environ.get("VIMZ_LOG"))


def log(msg: str):
    if enabled():
        print(f"[vimz] {'  ' * _DEPTH}{msg}", file=sys.stderr, flush=True)


@contextmanager
def span(name: str, **fields):
    global _DEPTH
    extra = "".join(f" {k}={v}" for k, v in fields.items())
    log(f"{name}{extra} ...")
    _DEPTH += 1
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _DEPTH -= 1
        _RECORS.append((name, dt))
        log(f"{name}: {dt:.2f}s")


def traced(fn):
    @wraps(fn)
    def wrapper(*args, **kwargs):
        with span(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper


def collected() -> list[tuple[str, float]]:
    """(name, seconds) for every closed span, in close order."""
    return list(_RECORS)


def reset():
    _RECORS.clear()


@contextmanager
def jax_profile(path: str):
    """Capture a JAX device profile (TensorBoard trace) around a block."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
