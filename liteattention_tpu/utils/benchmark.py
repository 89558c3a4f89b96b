"""Benchmarking helpers (reference flash_attn/utils/benchmark.py).

The reference wraps torch.utils.benchmark + torch.profiler; the TPU
equivalents are wall-clock timing with a hard host sync (device
readback -- ``block_until_ready`` alone can return early through remote
runtimes) and ``jax.profiler`` traces.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hard_sync(x) -> None:
    """Force completion via a scalar device->host readback."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def benchmark_forward(
    fn: Callable,
    *args,
    repeats: int = 10,
    warmup: int = 2,
    desc: str = "",
    verbose: bool = True,
    **kwargs,
) -> Tuple[float, float]:
    """Time ``fn(*args, **kwargs)``; returns (mean_s, std_s).

    Parity surface of reference ``benchmark_forward``
    (flash_attn/utils/benchmark.py:14-40).
    """
    for _ in range(warmup):
        hard_sync(fn(*args, **kwargs))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        hard_sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    mean, std = float(np.mean(times)), float(np.std(times))
    if verbose and desc:
        print(f"{desc}: {mean * 1e3:.3f} ms (+/- {std * 1e3:.3f})")
    return mean, std


def benchmark_memory(fn: Callable, *args, desc: str = "", **kwargs) -> float:
    """Peak live bytes on the default device after running ``fn``
    (reference ``benchmark_memory``, flash_attn/utils/benchmark.py:258)."""
    out = fn(*args, **kwargs)
    hard_sync(out)
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
    if desc:
        print(f"{desc}: peak {peak / 2**30:.3f} GiB")
    return float(peak)


def profile_trace(fn: Callable, *args, log_dir: str = "/tmp/jax-trace",
                  **kwargs):
    """Capture a jax.profiler trace of one invocation (the TPU analog of
    the reference's ncu/torch.profiler flows, profile_lite_attention.sh)."""
    with jax.profiler.trace(log_dir):
        out = fn(*args, **kwargs)
        hard_sync(out)
    return log_dir


__all__ = ["benchmark_forward", "benchmark_memory", "profile_trace", "hard_sync"]
