"""Bisect where camera-center grads go NaN in the hard renderer."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
from jax._src import xla_bridge; xla_bridge._clear_backends()

import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, 'tests')
from test_diff_geom import _tri_scene
from raytracinginonesemester_tpu.diff.inverse import apply_params
from raytracinginonesemester_tpu.ops.intersect import intersect_closest, make_hit_frame
from raytracinginonesemester_tpu.ops import shading

scene = _tri_scene()
c0 = scene.camera.center


def stage(fn, name):
    g = np.asarray(jax.grad(fn)(c0))
    print(name, "grad:", g, "nan:", np.isnan(g).any())


def rays(c):
    s = apply_params(scene, {"camera_center": c})
    o, d = s.camera.image_rays()
    return s, o.reshape(-1, 3), d.reshape(-1, 3)

stage(lambda c: jnp.sum(rays(c)[1]) + jnp.sum(rays(c)[2]), "A rays")

def loss_t(c):
    s, o, d = rays(c)
    h = intersect_closest(o, d, s.geometry.vertices)
    return jnp.sum(jnp.where(h.hit, h.t, 0.0))
stage(loss_t, "B hits.t")

def loss_p(c):
    s, o, d = rays(c)
    h = intersect_closest(o, d, s.geometry.vertices)
    p, n, _ = make_hit_frame(o, d, h, s.geometry.vertices, s.geometry.normals, mode="gpu")
    p = jnp.where(h.hit[:, None], p, 1e30)
    return jnp.sum(jnp.where(h.hit[:, None], p + n, 0.0))
stage(loss_p, "C hit frame")

def loss_direct(c):
    s, o, d = rays(c)
    h = intersect_closest(o, d, s.geometry.vertices)
    p, n, _ = make_hit_frame(o, d, h, s.geometry.vertices, s.geometry.normals, mode="gpu")
    p = jnp.where(h.hit[:, None], p, 1e30)
    obj = s.geometry.obj_id[jnp.maximum(h.tri_idx, 0)]
    mat = s.materials.gather(obj)
    occl = lambda oo, dd, lo_, hi_: jnp.zeros((oo.shape[0],), bool)
    direct, _ = shading.shade_direct(o, d, p, n, mat, s.lights, occl,
                                     jnp.zeros((o.shape[0],), jnp.uint32), dialect="gpu")
    return jnp.sum(jnp.where(h.hit[:, None], direct, 0.0))
stage(loss_direct, "D direct")

from raytracinginonesemester_tpu.render.renderer import render_scene
def loss_full(c):
    s = apply_params(scene, {"camera_center": c})
    img = render_scene(s, jitter_mode="center", spp_override=1)
    return jnp.mean(img ** 2)
stage(loss_full, "E full")
