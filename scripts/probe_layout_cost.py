"""Is the XLA integrator's (R, 3) array layout wasting the VPU?

TPU tiles put the LAST dim on 128 lanes; an (R, 3) f32 array uses 3 of
128 lanes unless XLA picks a better layout.  Times a 60-op elementwise
chain on the same 1.55M floats as (R, 3), (3, R) and flat (R,), plus a
chain of vector ops written the integrator's way (sum/keepdims norms).
Scalar-fetch sync, subtract rtt.
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 518400

def timed(name, fn, iters=5):
    t0 = time.time()
    c = float(jax.device_get(fn(0)))
    warm = time.time() - t0
    ts = []
    for i in range(iters):
        t0 = time.time()
        float(jax.device_get(fn(i + 1)))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:26s}: {med*1e3:8.2f} ms (warm {warm:.1f}s chk {c:.4g})",
          flush=True)

noop = jax.jit(lambda o: jnp.sum(jnp.full((8, 128), o, jnp.float32)))
timed("rtt_floor", noop)

rs = np.random.RandomState(0)
a3 = jnp.asarray(rs.standard_normal((R, 3)).astype(np.float32))
a3t = jnp.asarray(np.asarray(a3).T.copy())
af = a3.reshape(-1)

def chain(x, s, n=60):
    x = x + s
    for k in range(n):
        x = x * 1.0001 + 0.3 * jnp.sin(x) if k % 7 == 0 else x * 1.0001 + 0.001
    return jnp.sum(x)

timed("chain60 (R,3)", jax.jit(lambda s: chain(a3, s)))
timed("chain60 (3,R)", jax.jit(lambda s: chain(a3t, s)))
timed("chain60 flat",  jax.jit(lambda s: chain(af, s)))

def veccy(x, s, n=20):
    x = x + s
    for _ in range(n):
        l = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-24))
        x = x / l + 0.001 * jnp.cross(x, x[:, ::-1] if x.shape[-1] == 3 else x)
    return jnp.sum(x)

timed("norm20+cross (R,3)", jax.jit(lambda s: veccy(a3, s)))
