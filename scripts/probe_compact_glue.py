"""Microbench the XLA primitives a bounce-wavefront compaction needs.

A compacted bounce wavefront = (a) in-tile stable partition of alive
lanes, (b) cross-tile pack (monotonic flat gather), (c) the inverse
permutation to put radiance back on pixels.  All three are permutation
applications; this measures the candidate lowerings on the real chip:

  1. take_along_axis on the lane axis of (T, 512) x 13 planes
  2. lax.sort by key with 13 payload operands (stable)
  3. flat monotonic row gather (2M, 16)
  4. byte-sliced one-hot bf16 matmul permutation (exact), chunked

Numbers decide whether the wavefront architecture's glue fits in a
~2-5 ms/bounce budget (vs the ~40-90 ms/bounce it would save).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T, R, P = 4080, 512, 13
rng = np.random.default_rng(0)
alive = (rng.random((T, R)) < 0.05).astype(np.float32)
planes = [jnp.asarray(rng.random((T, R)), jnp.float32) for _ in range(P)]
alive_j = jnp.asarray(alive)
flat = jnp.asarray(rng.random((T * R, 16)), jnp.float32)
flat_idx = jnp.sort(jnp.asarray(
    rng.choice(T * R, size=T * R, replace=False), jnp.int32))

dev = jax.devices()[0]
print("device", dev, flush=True)


def _sync(out):
    # forced scalar fetch: block_until_ready returns early on the
    # tunneled runtime (see CLAUDE.md); summing through device_get is
    # the only honest sync
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))
    return out


def timeit(name, fn, *args):
    out = _sync(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = _sync(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[2]
    print(f"{name}: {med * 1e3:8.2f} ms (incl ~rtt floor)", flush=True)
    return out


@jax.jit
def _noop(x):
    return x + 1.0


timeit_floor = None


@jax.jit
def via_take(alive, *planes):
    # stable partition ranks: alive first, dead after
    a = alive > 0.0
    r_alive = jnp.cumsum(alive, axis=1) - alive
    n_alive = jnp.sum(alive, axis=1, keepdims=True)
    dead = 1.0 - alive
    r_dead = n_alive + jnp.cumsum(dead, axis=1) - dead
    pos = jnp.where(a, r_alive, r_dead).astype(jnp.int32)  # dest lane
    # inverse permutation via scatter-free trick: sort lane-iota by pos
    # (pos is a permutation; argsort(pos) = inverse)
    inv = jnp.argsort(pos, axis=1)
    return tuple(jnp.take_along_axis(p, inv, axis=1) for p in planes)


@jax.jit
def via_sort(alive, *planes):
    key = jnp.where(alive > 0.0, 0.0, 1.0)
    out = jax.lax.sort((key,) + planes, dimension=1, is_stable=True,
                       num_keys=1)
    return out[1:]


@jax.jit
def flat_gather(x, idx):
    return x[idx]


@jax.jit
def onehot_perm(alive, *planes):
    a = alive > 0.0
    r_alive = jnp.cumsum(alive, axis=1) - alive
    n_alive = jnp.sum(alive, axis=1, keepdims=True)
    dead = 1.0 - alive
    r_dead = n_alive + jnp.cumsum(dead, axis=1) - dead
    pos = jnp.where(a, r_alive, r_dead).astype(jnp.int32)  # (T, R)
    stacked = jnp.stack(planes, axis=-1)  # (T, R, P)
    bits = jax.lax.bitcast_convert_type(stacked, jnp.uint32)
    bytes_ = jnp.stack(
        [(bits >> (8 * k)) & 0xFF for k in range(4)], axis=-1
    ).astype(jnp.bfloat16).reshape(T, R, P * 4)

    def chunk(args):
        pos_c, byt_c = args
        # P1[t, j, i] = 1 where pos[t, i] == j  (dest j pulls source i)
        onehot = (pos_c[:, None, :] == jnp.arange(R)[None, :, None])
        out = jnp.einsum("tji,tip->tjp", onehot.astype(jnp.bfloat16),
                         byt_c, preferred_element_type=jnp.float32)
        return out

    n_chunk = 16
    byt = bytes_.reshape(n_chunk, T // n_chunk, R, P * 4)
    pos_r = pos.reshape(n_chunk, T // n_chunk, R)
    out = jax.lax.map(chunk, (pos_r, byt))  # (nc, T/nc, R, P*4)
    out = out.reshape(T, R, P, 4).astype(jnp.uint32)
    words = (out[..., 0] | (out[..., 1] << 8) | (out[..., 2] << 16)
             | (out[..., 3] << 24))
    return jax.lax.bitcast_convert_type(words, jnp.float32)


timeit("rtt_floor (no-op jit)", _noop, jnp.float32(1.0))
o1 = timeit("take_along_axis x13", via_take, alive_j, *planes)
o2 = timeit("lax.sort 13 payloads", via_sort, alive_j, *planes)
o3 = timeit("flat monotonic gather (2M,16)", flat_gather, flat, flat_idx)
o4 = timeit("one-hot bf16 byte-sliced perm", onehot_perm, alive_j, *planes)

a = np.stack([np.asarray(x) for x in o1], -1)
b = np.stack([np.asarray(x) for x in o2], -1)
c = np.asarray(o4)
print("take == sort:", np.array_equal(a, b))
print("onehot == take:", np.array_equal(c, a))


# --- global flat sorts: compaction + coherence in one op ---
flat_key = jnp.asarray(
    np.where(rng.random(T * R) < 0.05,
             rng.integers(0, 1 << 27, T * R),
             np.int32(2**31 - 1)).astype(np.int32))
fplanes = [jnp.asarray(rng.random(T * R), jnp.float32) for _ in range(13)]


@jax.jit
def global_sort13(key, *planes):
    return jax.lax.sort((key,) + planes, dimension=0, is_stable=True,
                        num_keys=1)


@jax.jit
def global_sort4(key, *planes):
    return jax.lax.sort((key,) + planes[:4], dimension=0, is_stable=True,
                        num_keys=1)


timeit("global 2M sort, 13 payloads", global_sort13, flat_key, *fplanes)
timeit("global 2M sort, 4 payloads", global_sort4, flat_key, *fplanes)
