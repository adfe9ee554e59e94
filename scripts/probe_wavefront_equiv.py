"""Bit-identity probe: wavefront (emit/sort/resume) vs monolithic
megakernel on the two-frog scene (diffuse and mirror variants)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge
xla_bridge._clear_backends()

import dataclasses
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.test_megakernel import _two_frog_scene
from raytracinginonesemester_tpu.ops.megakernel import render_tiles
from raytracinginonesemester_tpu.ops.wavefront import render_tiles_wavefront
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

print("devices", jax.devices())

for diffuse, depth, spp in ((True, 3, 1), (False, 4, 1), (True, 2, 2)):
    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=diffuse,
                            max_bounces=depth)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(64, 32)
    a = np.asarray(render_tiles(scene, xs, ys, spp, interpret=True))
    b = np.asarray(render_tiles_wavefront(scene, xs, ys, spp,
                                          interpret=True))
    same = np.array_equal(a, b)
    print(f"diffuse={diffuse} depth={depth} spp={spp}: "
          f"bit-identical={same} maxdiff={np.abs(a - b).max():.3e}")
    if not same:
        sys.exit(1)
print("OK")
