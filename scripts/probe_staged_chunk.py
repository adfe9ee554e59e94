"""On-chip A/B of sublane-chunked staged bounce visits (round-3 lever:
the compaction sort clusters slab-passing lanes, so post-sort tiles
should skip dead row-chunks where the round-1 unsorted experiment
lost).  frog 1080p spp1 depth-8, single dispatch, honest scalar-fetch
sync; compares staged_chunk in {0, 64, 128, 256}."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops.wavefront import (auto_capacity_tiles,
                                                       render_tiles_wavefront)
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

scene = _frog_scene(width=1920, height=1080, spp=1, max_bounces=8,
                    diffuse_bounce=True)
xs, ys, _ = _swizzled_grid(1920, 1080)
cap = auto_capacity_tiles(scene)
print("capacity:", cap, flush=True)

def timeit(tag, f, *a):
    t0 = time.time()
    o = f(*a); float(jax.device_get(jnp.sum(o)))
    print(f"{tag:24s} compile+1: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.time(); o = f(*a); float(jax.device_get(jnp.sum(o)))
        ts.append(time.time() - t0)
    print(f"{tag:24s} {sorted(ts)[2]*1e3:8.2f} ms", flush=True)
    return o

base = None
for chunk in (0, 64, 128, 256):
    img = timeit(f"staged_chunk={chunk}",
                 lambda c=chunk: render_tiles_wavefront(
                     scene, xs, ys, 1, capacity_tiles=cap,
                     staged_chunk=c))
    import numpy as np
    img = np.asarray(img)
    if base is None:
        base = img
    else:
        print(f"  bit-identical vs chunk0: {bool((img == base).all())}",
              flush=True)
