"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5: tqdm bars only). The
TPU-native equivalents: jax.profiler traces viewable in TensorBoard/Perfetto,
and accurate wall-clock timing that accounts for async dispatch
(block_until_ready).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sodt-trace") -> Iterator[None]:
    """Capture a device trace: `with trace(): run()` then load log_dir in
    TensorBoard (Profile plugin) or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None) -> Iterator[None]:
    """Wall-clock a block, draining the async dispatch queue at both ends so
    the measurement covers exactly the enclosed device work."""
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    if label:
        print(f"[timed] {label}: {dt:.3f}s")


def block_all(tree) -> None:
    """block_until_ready on every leaf of a pytree."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
