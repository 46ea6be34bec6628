"""Scatter row-count scaling + OOB mode costs, in the proven harness."""
import time
import numpy as np
import jax, jax.numpy as jnp

# keep the heavy imports to match _prof15's process state
from relightable3dgaussian_tpu.models import gaussians as G  # noqa


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

for N in (1_280_000, 655_360, 327_680, 163_840):
    idx = jnp.asarray(rng.integers(0, cap, N).astype(np.int32))
    g = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))

    @jax.jit
    def sc(gg, i):
        out = jnp.zeros((cap, D), jnp.float32).at[i].add(gg)
        return gg + out[0, 0]

    timeit_chain(f"scatter N={N}", sc, g, idx)

N = 655_360
idx = jnp.asarray(rng.integers(0, cap, N).astype(np.int32))
idx_oob = jnp.asarray(rng.integers(0, cap + 50_000, N).astype(np.int32))
g = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))


@jax.jit
def sc_drop(gg, i):
    out = jnp.zeros((cap, D), jnp.float32).at[i].add(gg, mode="drop")
    return gg + out[0, 0]


@jax.jit
def sc_promise(gg, i):
    out = jnp.zeros((cap, D), jnp.float32).at[i].add(
        gg, mode="promise_in_bounds")
    return gg + out[0, 0]


timeit_chain("scatter N=655k mode=drop (oob idx)", sc_drop, g, idx_oob)
timeit_chain("scatter N=655k mode=promise", sc_promise, g, idx)

# take cost for the compact gather: 655k rows from [1.28M, 14]
src0 = jnp.asarray(rng.uniform(size=(1_280_000, D)).astype(np.float32))
pos = jnp.asarray(rng.integers(0, 1_280_000, N).astype(np.int32))
pos_oob = jnp.asarray(rng.integers(0, 1_400_000, N).astype(np.int32))


@jax.jit
def tk_clip(s, p):
    o = jnp.take(s, p, axis=0, mode="clip")
    return s + o[0, 0]


@jax.jit
def tk_fill(s, p):
    o = jnp.take(s, p, axis=0, mode="fill", fill_value=0.0)
    return s + o[0, 0]


timeit_chain("take 655k rows mode=clip", tk_clip, src0, pos)
timeit_chain("take 655k rows mode=fill (oob)", tk_fill, src0, pos_oob)

# scatter of bf16 updates with f32 accum emulation: two half-width scatters?
g8 = jnp.asarray(rng.uniform(size=(N, 8)).astype(np.float32))


@jax.jit
def sc8(gg, i):
    out = jnp.zeros((cap, 8), jnp.float32).at[i].add(gg)
    return gg + out[0, 0]


timeit_chain("scatter N=655k D=8", sc8, g8, idx)
print("done", flush=True)
