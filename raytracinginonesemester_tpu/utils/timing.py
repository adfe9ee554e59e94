"""Timing, throughput metrics, and profiling utilities.

TPU-native analog of the reference's measurement discipline (SURVEY §5):
``std::chrono`` spans around renders with explicit device sync
(``main.cu:281-293, 361-378``), warmup passes to exclude JIT cost
(``warmup.h:10-90``), and rays/s derived metrics — plus ``jax.profiler``
trace capture, which the reference has no equivalent of.

The one environment-specific subtlety: through a tunneled runtime,
``block_until_ready`` may return before remote execution finishes, so
``sync()`` forces an actual device->host fetch of one scalar.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["sync", "Timer", "measure", "profile_trace", "rays_per_second"]


def sync(tree) -> None:
    """Hard device sync: fetch one scalar derived from the value.

    The moral equivalent of ``cudaDeviceSynchronize`` before stopping a
    timer (``main.cu:290``); robust where ``block_until_ready`` is not.
    """
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "ravel")]
    if leaves:
        float(jnp.asarray(leaves[0]).ravel()[0])


class Timer:
    """Wall-clock span with device sync on exit.

    >>> with Timer("render") as t:
    ...     img = render_scene(scene)
    ...     t.result = img
    >>> t.seconds
    """

    def __init__(self, name: str = "", echo: bool = False):
        self.name = name
        self.echo = echo
        self.result = None
        self.seconds = 0.0

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if self.result is not None:
            sync(self.result)
        self.seconds = time.time() - self.t0
        if self.echo:
            print(f"{self.name}: {self.seconds * 1e3:.2f} ms", file=sys.stderr)
        return False


def measure(fn: Callable, *args, warmup: int = 1, iters: int = 5) -> dict:
    """Warmup-then-measure (the reference's warmup discipline,
    ``warmup.h`` / ``main.cu:361-367``); returns timing stats in seconds."""
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        sync(fn(*args))
        times.append(time.time() - t0)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "iters": iters,
    }


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a ``jax.profiler`` trace (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def rays_per_second(width: int, height: int, spp: int, seconds: float,
                    waves: int = 1) -> dict:
    """Derived throughput metrics: camera rays and traced-ray estimate."""
    camera_rays = width * height * spp
    return {
        "camera_rays_per_s": camera_rays / seconds,
        "traced_rays_per_s_est": camera_rays * waves / seconds,
        "frame_ms": seconds * 1e3,
    }
