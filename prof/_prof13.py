"""Isolate: scatter row-count scaling, OOB modes, gather fill cost."""
import time
import numpy as np
import jax, jax.numpy as jnp


def timeit(name, fn, *args, n=3, inner=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner)
    print(f"{name:56s} {np.median(ts)*1000:8.2f} ms", flush=True)
    return out


rng = np.random.default_rng(0)
cap = 131_072
D = 14

for N in (1_280_000, 655_360, 327_680, 163_840):
    idx = jnp.asarray(rng.integers(0, cap, N).astype(np.int32))
    g = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
    f = jax.jit(lambda i, x: jnp.zeros((cap, D), jnp.float32).at[i].add(x))
    timeit(f"scatter-add N={N}", f, idx, g)

N = 655_360
idx = jnp.asarray(rng.integers(0, cap + 1, N).astype(np.int32))  # some OOB
g = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
f_drop = jax.jit(
    lambda i, x: jnp.zeros((cap, D), jnp.float32).at[i].add(x, mode="drop"))
timeit("scatter-add N=655k mode=drop", f_drop, idx, g)

# gather modes from a big flat array
NT = 1_280_000
src = jnp.asarray(rng.uniform(size=(NT, D)).astype(np.float32))
pos = jnp.asarray(rng.integers(0, NT + 1, N).astype(np.int32))
timeit("take N=655k mode=clip",
       jax.jit(lambda s, p: jnp.take(s, p, axis=0, mode="clip")), src, pos)
timeit("take N=655k mode=fill",
       jax.jit(lambda s, p: jnp.take(s, p, axis=0, mode="fill",
                                     fill_value=0.0)), src, pos)
# scatter-add narrower rows
for DD in (1, 4, 14, 28):
    gg = jnp.asarray(rng.uniform(size=(655_360, DD)).astype(np.float32))
    ii = jnp.asarray(rng.integers(0, cap, 655_360).astype(np.int32))
    f = jax.jit(lambda i, x: jnp.zeros((cap, x.shape[1]),
                                       jnp.float32).at[i].add(x))
    timeit(f"scatter-add N=655k D={DD}", f, ii, gg)
print("done", flush=True)
