"""Batched frames per dispatch: merged bounce phase vs frame-at-a-time.

Measures the headline frog 1080p depth-8 workload two ways, 8 frames
per dispatch each:
  (a) lax.scan of 8 independent render_scene calls (what bench.py r2 did)
  (b) render_scene_frames(8): ONE merged compaction sort + staged
      ladder shared by all 8 frames' bounce wavefronts
Scalar-fetch sync, median of 5; the ~26-28 ms tunnel RTT is amortized
over the 8 frames in both cases.

Run on the real TPU: `python scripts/probe_frames_batch.py [frames]`.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.render.renderer import (
    render_scene, render_scene_frames, resolve_wavefront)

F = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W, H, DEPTH = 1920, 1080, 8

scene = _frog_scene(width=W, height=H, spp=1, max_bounces=DEPTH,
                    diffuse_bounce=True)
jax.block_until_ready(scene.accel.tri)
wf, cap = resolve_wavefront(scene, "wang", 1)
print(f"device {jax.devices()[0]}  frames {F}  wavefront={wf} cap={cap}",
      flush=True)


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
    print(f"{name:24s}: {med * 1e3:8.2f} ms/dispatch = "
          f"{med * 1e3 / F:7.2f} ms/frame  (warmup {warm:.1f}s, "
          f"chk {c:.3f})", flush=True)
    return med


@jax.jit
def scan_frames(s, off0):
    def one(c, off):
        img = render_scene(s, jitter_mode="wang", spp_override=1,
                           sample_offset=off)
        return c + jnp.sum(img), 0

    total, _ = jax.lax.scan(one, jnp.float32(0.0), off0 + jnp.arange(F))
    return total


@jax.jit
def merged_frames(s, off0):
    return jnp.sum(render_scene_frames(s, F, jitter_mode="wang",
                                       sample_offset=off0))


timed("scan of render_scene", lambda i: scan_frames(scene, i * F))
timed("render_scene_frames", lambda i: merged_frames(scene, i * F))
