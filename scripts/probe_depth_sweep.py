"""Frame time vs max_depth for the megakernel (frog 1080p spp1 diffuse).

Localizes where the depth-8 default workload's time goes: the increment
from depth d to d+1 is the cost of bounce wavefront d (traversal +
shading + shadow walk at whatever lane occupancy survives to depth d).

Run on the real TPU: `python scripts/probe_depth_sweep.py [depths...]`.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops import megakernel as mk
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

W, H = 1920, 1080
depths = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]

base = _frog_scene(width=W, height=H, spp=1, max_bounces=8,
                   diffuse_bounce=True)
jax.block_until_ready(base.accel.tri)
xs, ys, _ = _swizzled_grid(W, H)
print(f"device {jax.devices()[0]}", file=sys.stderr, flush=True)

for d in depths:
    scene = dataclasses.replace(base, max_bounces=d)

    def frame(off):
        return jnp.sum(mk.render_tiles(scene, xs, ys, 1, sample_offset=off))

    t0 = time.time()
    c = float(jax.device_get(frame(0)))
    warm = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        float(jax.device_get(frame(i + 1)))
        times.append(time.time() - t0)
    med = sorted(times)[1]
    print(f"depth {d}: {med * 1e3:8.2f} ms  (warmup {warm:.1f}s, "
          f"checksum {c:.1f})", flush=True)
