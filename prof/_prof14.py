"""Chained-dependency microbench: defeat any relay memoization by feeding
each iteration's output into the next."""
import time
import numpy as np
import jax, jax.numpy as jnp


def timeit_chain(name, fn, x0, *args, n=3, inner=20):
    x = fn(x0, *args)
    jax.block_until_ready(x)
    ts = []
    for _ in range(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(inner):
            x = fn(x, *args)
        jax.block_until_ready(x)
        ts.append((time.perf_counter() - t0) / inner)
    print(f"{name:56s} {np.median(ts)*1000:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
cap = 131_072
D = 14

for N in (1_280_000, 655_360, 327_680):
    idx = jnp.asarray(rng.integers(0, cap, N).astype(np.int32))
    g0 = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))

    @jax.jit
    def step(g, i):
        out = jnp.zeros((cap, D), jnp.float32).at[i].add(g)
        # chain: gather back to g's shape (adds a take of N rows)
        return jnp.take(out, i, axis=0)

    timeit_chain(f"scatter+takeback chain N={N}", step, g0, idx)

    @jax.jit
    def step2(g, i):
        out = jnp.zeros((cap, D), jnp.float32).at[i].add(g)
        return g + out[0, 0]  # scalar dependency only

    timeit_chain(f"scatter (scalar-chained) N={N}", step2, g0, idx)
print("done", flush=True)
