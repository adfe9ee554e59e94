"""Debug probe: inspect soft-render intermediates at a failing pixel."""
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
from raytracinginonesemester_tpu.ops.intersect import chunk_tuv

scene = _tri_scene()
cam = scene.camera
geom = scene.geometry
verts = geom.vertices
o_img, d_img = cam.image_rays()
w = cam.width
y, x = 20, 34
o = o_img[y, x].reshape(1, 3)
d = d_img[y, x].reshape(1, 3)

sigma, gamma = 1e-4, 1e-3
t, u, v, det_ok = chunk_tuv(o, d, verts, 1e-8)
print("t", np.asarray(t)[0, :3], "u", np.asarray(u)[0, :3], "v", np.asarray(v)[0, :3],
      "det_ok", np.asarray(det_ok)[0, :3])
print("obj_id", np.asarray(geom.obj_id)[:8])
sd = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
print("sd", np.asarray(sd)[0, :3], "cov", np.asarray(jax.nn.sigmoid(sd / sigma))[0, :3])

vflat = verts.reshape(-1, 3)
lo = jnp.min(vflat, axis=0); hi = jnp.max(vflat, axis=0)
diag = jnp.sqrt(jnp.sum((hi - lo) ** 2)) + 1e-6
center = 0.5 * (lo + hi)
t_bg = jnp.sqrt(jnp.sum((center - cam.center) ** 2)) + diag
print("diag", float(diag), "t_bg", float(t_bg), "hit t", float(t[0, 0]))
print("padding verts sample:", np.asarray(vflat[3:6]))

# replicate the shade_direct call with the aggregated hit values
from raytracinginonesemester_tpu.ops import shading
from raytracinginonesemester_tpu.scene.material import MaterialTable
mats = scene.materials
p_bar = o + 3.516838 * d
n_bar = jnp.array([[0.0, -1.0, 0.0]], jnp.float32)
mat_r = MaterialTable(
    albedo=mats.albedo[:1], kd=mats.kd[:1], specular_color=mats.specular_color[:1],
    ks=mats.ks[:1], shininess=jnp.maximum(mats.shininess[:1], 1.0),
    kr=jnp.zeros_like(mats.kd[:1]), emission=mats.emission[:1])
occl = lambda oo, dd, lo_, hi_: jnp.zeros((oo.shape[0],), bool)
lo_rgb, _ = shading.shade_direct(p_bar * 0 + o, d, p_bar, n_bar, mat_r, scene.lights,
                                 occl, jnp.zeros((1,), jnp.uint32), dialect="gpu")
print("direct shade_direct lo:", np.asarray(lo_rgb))
print("lights:", np.asarray(scene.lights.position), np.asarray(scene.lights.color),
      np.asarray(scene.lights.intensity), "num_lights", scene.lights.num_lights)

# replicate render_soft's scan verbatim for this one ray
gamma = jnp.asarray(1e-3, jnp.float32)
t_bgj = jnp.asarray(float(t_bg), jnp.float32)
obj = jnp.clip(geom.obj_id, 0, mats.kd.shape[0] - 1)
pad_dead = geom.obj_id < 0
t_count = verts.shape[0]
chunk = min(512, t_count)
tris = verts.reshape(t_count // chunk, chunk, 3, 3)
tri_norm = geom.normals.reshape(t_count // chunk, chunk, 3, 3)
tri_obj = obj.reshape(t_count // chunk, chunk)
tri_dead = pad_dead.reshape(t_count // chunk, chunk)
tmin = 1e-4

m = jnp.full((1,), t_bgj, jnp.float32)
s_w = jnp.zeros((1,), jnp.float32)
acc = jnp.zeros((1, 16), jnp.float32)
for ci in range(t_count // chunk):
    tri, nrm, ob, dead = tris[ci], tri_norm[ci], tri_obj[ci], tri_dead[ci]
    t, u, v, det_ok = chunk_tuv(o, d, tri, 1e-8)
    sd = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
    cov = jax.nn.sigmoid(sd / sigma)
    ok = det_ok & (t >= tmin) & ~dead[None, :]
    cov = jnp.where(ok, cov, 0.0)
    relevant = cov > 1e-6
    t = jnp.where(relevant, t, t_bgj)
    new_m = jnp.minimum(m, jnp.min(t, axis=-1))
    rescale = jnp.exp((new_m - m) / gamma)
    w_c = cov * jnp.exp(-(t - new_m[:, None]) / gamma)
    print("chunk", ci, "cov", np.asarray(cov)[0], "w_c", np.asarray(w_c)[0],
          "rescale", np.asarray(rescale))
    w_b = 1.0 - u - v
    interp = (w_b[..., None] * nrm[None, :, 0] + u[..., None] * nrm[None, :, 1]
              + v[..., None] * nrm[None, :, 2])
    ilen = jnp.sqrt(jnp.maximum(jnp.sum(interp * interp, axis=-1, keepdims=True), 1e-38))
    sn = interp / ilen
    sn = jnp.where(jnp.sum(sn * d[:, None, :], axis=-1, keepdims=True) > 0.0, -sn, sn)
    mat_c = jnp.concatenate([
        mats.albedo[ob], mats.kd[ob][:, None], mats.specular_color[ob],
        mats.ks[ob][:, None], mats.shininess[ob][:, None], mats.emission[ob]], axis=-1)
    agg_n = jnp.sum(w_c[..., None] * sn, axis=1)
    agg_mat = w_c @ mat_c
    agg_t = jnp.sum(w_c * t, axis=-1)
    acc = acc * rescale[:, None] + jnp.concatenate([agg_n, agg_mat, agg_t[:, None]], axis=-1)
    s_w = s_w * rescale + jnp.sum(w_c, axis=-1)
    m = new_m

w_bg = jnp.exp(-(t_bgj - m) / gamma)
denom = jnp.maximum(s_w, 1e-20)
print("s_w", np.asarray(s_w), "w_bg", np.asarray(w_bg), "m", np.asarray(m))
print("n_bar raw", np.asarray(acc[:, 0:3] / denom[:, None]))
print("mat_bar", np.asarray(acc[:, 3:15] / denom[:, None]))
print("t_bar", np.asarray(acc[:, 15] / denom))

# locate the NaN
t2, u2, v2, ok2 = chunk_tuv(o, d, tris[0], 1e-8)
print("u2", np.asarray(u2)[0], "\nv2", np.asarray(v2)[0], "\nt2", np.asarray(t2)[0])
w_b2 = 1.0 - u2 - v2
interp2 = (w_b2[..., None] * tri_norm[0][None, :, 0] + u2[..., None] * tri_norm[0][None, :, 1]
           + v2[..., None] * tri_norm[0][None, :, 2])
print("interp2", np.asarray(interp2)[0])

ilen2 = jnp.sqrt(jnp.maximum(jnp.sum(interp2 * interp2, axis=-1, keepdims=True), 1e-38))
sn2 = interp2 / ilen2
print("ilen2", np.asarray(ilen2)[0, :, 0])
print("sn2", np.asarray(sn2)[0])
sn2f = jnp.where(jnp.sum(sn2 * d[:, None, :], axis=-1, keepdims=True) > 0.0, -sn2, sn2)
print("sn2f", np.asarray(sn2f)[0])
w_c2 = jnp.array([[1., 0, 0, 0, 0, 0, 0, 0]], jnp.float32)
print("agg_n2", np.asarray(jnp.sum(w_c2[..., None] * sn2f, axis=1)))
