"""On-chip A/B: monolithic megakernel vs sort-compacted wavefront.

Frog 1080p spp1 diffuse depth-8 (the faithful frog.json workload).
Prints an RTT floor (no-op dispatch), then median single-dispatch frame
times for ``megakernel.render_tiles`` and
``wavefront.render_tiles_wavefront``.  Sync is by scalar fetch
(block_until_ready lies over the tunnel; see docs/DESIGN.md).

Run on the real TPU: `python scripts/measure_wavefront.py [W H depth]`.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops import megakernel as mk
from raytracinginonesemester_tpu.ops.wavefront import render_tiles_wavefront
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

args = [int(a) for a in sys.argv[1:]]
W, H = (args[0], args[1]) if len(args) >= 2 else (1920, 1080)
DEPTH = args[2] if len(args) >= 3 else 8

scene = _frog_scene(width=W, height=H, spp=1, max_bounces=DEPTH,
                    diffuse_bounce=True)
jax.block_until_ready(scene.accel.tri)
xs, ys, _ = _swizzled_grid(W, H)
print(f"device {jax.devices()[0]}  {W}x{H} depth {DEPTH}", flush=True)


def timed(name, fn, iters=5):
    t0 = time.time()
    c = float(jax.device_get(fn(0)))
    warm = time.time() - t0
    times = []
    for i in range(iters):
        t0 = time.time()
        float(jax.device_get(fn(i + 1)))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name:12s}: {med * 1e3:8.2f} ms  (warmup {warm:.1f}s, "
          f"checksum {c:.3f}, all {[f'{t*1e3:.1f}' for t in times]})",
          flush=True)
    return med


noop = jax.jit(lambda o: jnp.sum(jnp.full((8, 128), o, jnp.float32)))
timed("rtt_floor", noop)
timed("monolithic", lambda off: jnp.sum(
    mk.render_tiles(scene, xs, ys, 1, sample_offset=off)))
timed("wavefront", lambda off: jnp.sum(
    render_tiles_wavefront(scene, xs, ys, 1, sample_offset=off)))
for cap in (256, 128):
    timed(f"staged@{cap}", lambda off, cap=cap: jnp.sum(
        render_tiles_wavefront(scene, xs, ys, 1, sample_offset=off,
                               capacity_tiles=cap)))
