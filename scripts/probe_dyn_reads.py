"""Micro-probe: dynamic strided VMEM row reads vs one block read.

The megakernel's dense visit reads 9 tri planes + 12 normal planes as
(1, B) rows at DYNAMIC offsets k*L + b (plane-major layout).  This
times, per visit:
  - dyn12: 12 dynamic (1, B) row reads (plane-major layout)
  - blk1:  one dynamic (12, B) block read (block-major layout) + static
           row unpacking
each followed by the same tiny use (sum into acc) so reads can't fold.

Run on the real TPU: `python scripts/probe_dyn_reads.py`.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RT, B, L, VISITS = 512, 512, 39, 4096


def dyn12_kernel(q_ref, out_ref):
    acc = jnp.zeros((1, B), jnp.float32)

    def body(k, acc):
        b = k % L
        for f in range(12):
            acc = acc + q_ref[pl.ds(f * L + b, 1), :]
        return acc

    out_ref[...] = jax.lax.fori_loop(0, VISITS, body, acc)


def blk1_kernel(q_ref, out_ref):
    acc = jnp.zeros((1, B), jnp.float32)

    def body(k, acc):
        b = k % L
        blk = q_ref[pl.ds(b * 12, 12), :]  # (12, B) one dynamic read
        for f in range(12):
            acc = acc + blk[f:f + 1, :]
        return acc

    out_ref[...] = jax.lax.fori_loop(0, VISITS, body, acc)


rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((12 * L, B)), jnp.float32)

dyn_call = pl.pallas_call(
    dyn12_kernel, out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32))
blk_call = pl.pallas_call(
    blk1_kernel, out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32))


def timed(name, fn, *args, iters=5):
    t0 = time.time()
    c = float(jax.device_get(jnp.sum(fn(*args))))
    warm = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        float(jax.device_get(jnp.sum(fn(*args))))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:8s}: {med * 1e3:8.3f} ms  ({med / VISITS * 1e6:6.2f} us/"
          f"visit)  warm {warm:.1f}s  chk {c:.6e}", flush=True)


noop = jax.jit(lambda o: jnp.full((8, 128), o, jnp.float32))
float(jax.device_get(jnp.sum(noop(0))))
rtts = []
for i in range(5):
    t0 = time.time()
    float(jax.device_get(jnp.sum(noop(i))))
    rtts.append(time.time() - t0)
print(f"rtt_floor: {sorted(rtts)[2]*1e3:.2f} ms", flush=True)

timed("dyn12", jax.jit(dyn_call), q)
timed("blk1", jax.jit(blk_call), q)
