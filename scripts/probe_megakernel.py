"""Bisect the megakernel's frame time: full / no-shadow / no-traversal."""
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
from raytracinginonesemester_tpu.utils.timing import measure

W, H = 1920, 1080
scene = _frog_scene(width=W, height=H, spp=1)
scene = dataclasses.replace(scene, max_bounces=4, use_pallas=True)
jax.block_until_ready(scene.accel.tri)
xs, ys, (hp, wp) = _swizzled_grid(W, H)


def frame(off):
    return jnp.sum(mk.render_tiles(scene, xs, ys, 1, sample_offset=off))


def run(name):
    mk.render_tiles.clear_cache()
    t0 = time.time()
    stats = measure(jax.jit(frame), jnp.int32(1), warmup=1, iters=5)
    print(f"{name}: {stats['median_s']*1e3:8.2f} ms (min {stats['min_s']*1e3:.2f},"
          f" c+w {time.time()-t0:.1f}s)", file=sys.stderr, flush=True)


run("full          ")
mk._DEBUG_SKIP_SHADOW = True
run("no shadow     ")
mk._DEBUG_SKIP_TRAVERSAL = True
run("no trav+shadow")
