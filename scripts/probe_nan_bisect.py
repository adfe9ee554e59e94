"""Bisect where NaN enters render_soft's backward pass."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
import jax
jax.config.update('jax_platforms', 'cpu')
from jax._src import xla_bridge
xla_bridge._clear_backends()

import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

from test_diff_geom import _tri_scene
from raytracinginonesemester_tpu.ops.intersect import chunk_tuv, occluded
from raytracinginonesemester_tpu.ops import shading
from raytracinginonesemester_tpu.scene.material import MaterialTable
import dataclasses

scene = _tri_scene()
cam = scene.camera
geom = scene.geometry
sigma = 0.02
det_eps = 1e-8
tmin = 1e-4

o_img, d_img = cam.image_rays()
o = o_img.reshape(-1, 3)
d = d_img.reshape(-1, 3)
r = o.shape[0]
mats = scene.materials
obj = jnp.clip(geom.obj_id, 0, mats.kd.shape[0] - 1)
pad_dead = np.asarray(geom.obj_id < 0)
t_count = geom.vertices.shape[0]


def upto(verts, stage):
    vflat = verts.reshape(-1, 3)
    lo = jnp.min(vflat, axis=0); hi = jnp.max(vflat, axis=0)
    diag = jnp.sqrt(jnp.sum((hi - lo) ** 2)) + 1e-6
    gamma = 1e-2 * diag
    center = 0.5 * (lo + hi)
    t_bg = jnp.sqrt(jnp.sum((center - cam.center) ** 2)) + diag
    if stage == 0:
        return jnp.sum(t_bg)

    tri = verts
    nrm = geom.normals
    dead = jnp.asarray(pad_dead)
    t, u, v, det_ok = chunk_tuv(o, d, tri, det_eps)
    u = jnp.clip(u, -1e3, 1e3)
    v = jnp.clip(v, -1e3, 1e3)
    if stage == 1:
        return jnp.sum(jnp.where(det_ok, u + v + jnp.clip(t, -1e3, 1e3), 0.0))

    sd = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
    cov = jax.nn.sigmoid(sd / sigma)
    ok = det_ok & (t >= tmin) & ~dead[None, :]
    cov = jnp.where(ok, cov, 0.0)
    if stage == 2:
        return jnp.sum(cov)

    relevant = cov > 1e-6
    t = jnp.where(relevant, t, t_bg)
    m0 = jnp.full((r,), 1e9, jnp.float32)
    new_m = jnp.minimum(m0, jnp.min(t, axis=-1))
    w_c = cov * jnp.exp(-(t - new_m[:, None]) / gamma)
    if stage == 3:
        return jnp.sum(w_c)

    w_b = 1.0 - u - v
    interp = (w_b[..., None] * nrm[None, :, 0] + u[..., None] * nrm[None, :, 1]
              + v[..., None] * nrm[None, :, 2])
    ilen = jnp.sqrt(jnp.maximum(jnp.sum(interp * interp, -1, keepdims=True), 1e-24))
    sn = interp / ilen
    sn = jnp.where(jnp.sum(sn * d[:, None, :], -1, keepdims=True) > 0.0, -sn, sn)
    agg_n = jnp.sum(w_c[..., None] * sn, axis=1)
    if stage == 4:
        return jnp.sum(agg_n)

    mat_c = jnp.concatenate([
        mats.albedo[obj], mats.kd[obj][:, None], mats.specular_color[obj],
        mats.ks[obj][:, None], mats.shininess[obj][:, None],
        mats.emission[obj]], axis=-1)
    agg_mat = w_c @ mat_c
    agg_t = jnp.sum(w_c * t, axis=-1)
    s_w = jnp.sum(w_c, axis=-1)
    w_bg = jnp.exp(-(t_bg - new_m) / gamma)
    denom = jnp.maximum(s_w, 1e-20)
    n_bar = agg_n / denom[:, None]
    n_bar = n_bar / jnp.sqrt(jnp.maximum(
        jnp.sum(n_bar * n_bar, -1, keepdims=True), 1e-24))
    mat_bar = agg_mat / denom[:, None]
    t_bar = agg_t / denom
    p_bar = o + t_bar[:, None] * d
    if stage == 5:
        return jnp.sum(n_bar) + jnp.sum(mat_bar) + jnp.sum(p_bar)

    mat_r = MaterialTable(
        albedo=mat_bar[:, 0:3], kd=mat_bar[:, 3],
        specular_color=mat_bar[:, 4:7], ks=mat_bar[:, 7],
        shininess=jnp.maximum(mat_bar[:, 8], 1.0),
        kr=jnp.zeros_like(mat_bar[:, 3]), emission=mat_bar[:, 9:12])
    occl = lambda oo, dd, lo_, hi_: jnp.zeros((oo.shape[0],), bool)
    lo_rgb, _ = shading.shade_direct(
        o, d, p_bar, n_bar, mat_r, scene.lights, occl,
        jnp.zeros((r,), jnp.uint32), dialect="gpu")
    if stage == 6:
        return jnp.sum(lo_rgb)

    bg = jnp.broadcast_to(jnp.asarray(scene.miss_color, jnp.float32), (r, 3))
    total = s_w + w_bg
    img = (s_w[:, None] * lo_rgb + w_bg[:, None] * bg) / total[:, None]
    img = jnp.clip(img, 0.0, 1.0)
    return jnp.mean(img ** 2)


v0 = scene.geometry.vertices
for stage in range(8):
    val = float(upto(v0, stage))
    g = np.asarray(jax.grad(lambda vv: upto(vv, stage))(v0))
    print(f"stage {stage}: val={val:.6g} grad_nan={np.isnan(g).any()} "
          f"grad_real_tri={g[0].ravel()[:3]}")
