"""Micro-probe: MXU one-hot attribute selection vs VPU lane reductions.

Times, per simulated dense visit on (RT=512, B=512):
  - sel7: 7 masked lane reductions (the current winner-attr pattern)
  - mm:   pick->bf16 cast + (512,512)x(512,128) bf16 matmul + transpose
          + 22x3 part reconstruction (the proposed pattern)
and checks the matmul selection reproduces the reduction bit-for-bit.

Run on the real TPU: `python scripts/probe_mm_select.py`.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RT, B, F, VISITS = 512, 512, 22, 4096


def split3(q):
    hi = q.astype(jnp.bfloat16).astype(jnp.float32)
    r = q - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (r - mid).astype(jnp.bfloat16)
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo


def _pick(win_ref, k):
    # per-iteration varying one-hot mask (defeats loop hoisting); the
    # same construction cost is paid by both variants
    win = (win_ref[...] + k) % B  # (RT, 1) int32
    lanes = jax.lax.broadcasted_iota(jnp.int32, (RT, B), 1)
    return lanes == win


def sel_kernel(win_ref, q_ref, out_ref):
    # 7 reductions like the current attr path (q rows as (1, B) planes)
    acc = jnp.zeros((1, RT), jnp.float32)

    def body(k, acc):
        pick = _pick(win_ref, k)
        for f in range(7):
            qrow = q_ref[pl.ds(f, 1), :]  # (1, B)
            s = jnp.sum(jnp.where(pick, qrow, 0.0), axis=1, keepdims=True)
            acc = acc + s.reshape(1, RT)
        return acc

    out_ref[...] = jax.lax.fori_loop(0, VISITS, body, acc)


def mm_kernel(win_ref, qsel_ref, out_ref):
    acc = jnp.zeros((1, RT), jnp.float32)

    def body(k, acc):
        pick = _pick(win_ref, k)
        pick_bf = jnp.where(pick, 1.0, 0.0).astype(jnp.bfloat16)
        out = jnp.dot(pick_bf, qsel_ref[...],
                      preferred_element_type=jnp.float32)  # (RT, 128)
        outt = out.T  # (128, RT)
        for f in range(22):  # reconstruct ALL attrs (3 parts each)
            a = (outt[f:f + 1, :] + outt[32 + f:33 + f, :]
                 + outt[64 + f:65 + f, :])
            acc = acc + a
        return acc

    out_ref[...] = jax.lax.fori_loop(0, VISITS, body, acc)


rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((F, B)), jnp.float32)
win = rng.integers(0, B, RT)
pick = np.zeros((RT, B), np.float32)
pick[np.arange(RT), win] = 1.0
pick = jnp.asarray(pick)

hi, mid, lo = split3(q)
qsel = jnp.zeros((B, 128), jnp.bfloat16)
qsel = qsel.at[:, 0:F].set(hi.T).at[:, 32:32 + F].set(mid.T).at[
    :, 64:64 + F].set(lo.T)

sel_call = pl.pallas_call(
    sel_kernel, out_shape=jax.ShapeDtypeStruct((1, RT), jnp.float32))
mm_call = pl.pallas_call(
    mm_kernel, out_shape=jax.ShapeDtypeStruct((1, RT), jnp.float32))


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
    return c


noop = jax.jit(lambda o: jnp.full((8, 128), o, jnp.float32))
t0 = time.time()
float(jax.device_get(jnp.sum(noop(0))))
rtts = []
for i in range(5):
    t0 = time.time()
    float(jax.device_get(jnp.sum(noop(i))))
    rtts.append(time.time() - t0)
print(f"rtt_floor: {sorted(rtts)[2]*1e3:.2f} ms", flush=True)

win_col = jnp.asarray(win.reshape(RT, 1), jnp.int32)
c1 = timed("sel7", jax.jit(sel_call), win_col, q)
c2 = timed("mm22", jax.jit(mm_call), win_col, qsel)

# per-attr bit check outside pallas
sel_ref = (pick @ q.T)  # f32 exact? no — use explicit masked sum
sel_exact = jnp.stack(
    [jnp.sum(jnp.where(pick > 0, q[f][None, :], 0.0), axis=1)
     for f in range(F)])
mm_out = jnp.dot(pick.astype(jnp.bfloat16), qsel,
                 preferred_element_type=jnp.float32)
mm_attr = (mm_out[:, 0:F] + mm_out[:, 32:32 + F] + mm_out[:, 64:64 + F]).T
same = np.asarray(sel_exact) == np.asarray(mm_attr)
print("attr values bit-identical:", bool(same.all()),
      f"({same.mean():.6f})")
