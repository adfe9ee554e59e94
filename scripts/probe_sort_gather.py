"""Cost of the compaction glue at 1080p scale on the real chip:
sort_key_val, permutation gathers, scatter — the building blocks of
bounce-wavefront compaction/binning.  Times include one fetch sync each;
compare against the no-op RTT floor printed first."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1920 * 1080
key = jax.random.PRNGKey(0)
oct_keys = jax.random.randint(key, (N,), 0, 8, jnp.int32)
vals = [jax.random.normal(jax.random.PRNGKey(i), (N,)) for i in range(10)]
perm0 = jnp.arange(N, dtype=jnp.int32)


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32).ravel()[:8])))


def timeit(name, fn, *a):
    out = fn(*a)
    sync(out)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = fn(*a)
        sync(out)
        ts.append(time.time() - t0)
    print(f"{name:34s} {sorted(ts)[2]*1e3:8.2f} ms", flush=True)
    return out


@jax.jit
def noop(x):
    return x + 1.0

timeit("rtt floor (scalar add)", noop, jnp.float32(1.0))

@jax.jit
def do_sort(k):
    return jax.lax.sort_key_val(k, perm0)

_, perm = timeit("sort_key_val 2M int32", do_sort, oct_keys)

@jax.jit
def do_argsort(k):
    return jnp.argsort(k)

timeit("argsort 2M", do_argsort, oct_keys)

@jax.jit
def gather10(p, vs):
    return [v[p] for v in vs]

timeit("gather 10 x 2M f32 by perm", gather10, perm, vals)

@jax.jit
def gather1(p, v):
    return v[p]

timeit("gather 1 x 2M f32 by perm", gather1, perm, vals[0])

@jax.jit
def scatter3(p, vs):
    z = jnp.zeros((N,), jnp.float32)
    return [z.at[p].set(v) for v in vs[:3]]

timeit("scatter 3 x 2M f32 by perm", scatter3, perm, vals)

# binned-rank compaction (cumsum-based) as the sort alternative
@jax.jit
def binned_rank(k):
    one_hot = (k[:, None] == jnp.arange(8)[None, :]).astype(jnp.int32)
    ranks = jnp.cumsum(one_hot, axis=0) - 1  # (N, 8)
    counts = ranks[-1] + 1
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    dst = jnp.take_along_axis(ranks, k[:, None], 1)[:, 0] + offs[k]
    return dst

timeit("binned-rank dst (8 cumsums)", binned_rank, oct_keys)
