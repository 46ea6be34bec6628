"""Robust primitive timings: 10 serial executions chained INSIDE one jit."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

rng = np.random.default_rng(0)
P = 131_072
N = 1_280_000
NC = 655_360
D = 16


def bench(name, make_fn, *args, reps=10):
    f = jax.jit(make_fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:58s} {min(ts)*1000:8.2f} ms", flush=True)


idx_n = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
idx_c = jnp.asarray(rng.integers(0, N, NC).astype(np.int32))
gg = jnp.asarray(rng.integers(0, P, NC).astype(np.int32))
packed = jnp.asarray(rng.uniform(size=(P, D)).astype(np.float32))
packedT = jnp.asarray(rng.uniform(size=(D, P)).astype(np.float32))
vec = jnp.asarray(rng.uniform(size=(P,)).astype(np.float32))
big = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
upd = jnp.asarray(rng.uniform(size=(NC, D)).astype(np.float32))
updT = jnp.asarray(rng.uniform(size=(D, NC)).astype(np.float32))


def chain(f, x0):
    """Run f 10 times with a scalar data dependency between iterations."""
    def body(i, carry):
        s, = carry
        out = f(s)
        return (out.reshape(-1)[0] * 1e-20,)
    return lax.fori_loop(0, 10, body, (x0,))[0]


bench("row-take [1.28M,16]src <- 655k idx (fusion.4 repro)",
      lambda s: chain(lambda t: jnp.take(big + t, idx_c, axis=0), s),
      jnp.float32(0))
bench("row-take [131k,16]src <- 1.28M idx (fusion.1 repro)",
      lambda s: chain(lambda t: jnp.take(packed + t, idx_n, axis=0), s),
      jnp.float32(0))
bench("axis1-take [16,131k]src <- 1.28M idx (SoA build)",
      lambda s: chain(lambda t: jnp.take(packedT + t, idx_n, axis=1), s),
      jnp.float32(0))
bench("1D-take [131k]vec <- 1.28M idx",
      lambda s: chain(lambda t: jnp.take(vec + t, idx_n), s),
      jnp.float32(0))
bench("scatter-add 655k compact rows -> [131k,16]",
      lambda s: chain(lambda t: jnp.zeros((P, D), jnp.float32)
                      .at[gg].add(upd + t, mode="promise_in_bounds"), s),
      jnp.float32(0))
bench("scatter-add 1.28M rows -> [131k,16]",
      lambda s: chain(lambda t: jnp.zeros((P, D), jnp.float32)
                      .at[idx_n[:N]].add(big + t,
                                         mode="promise_in_bounds"), s),
      jnp.float32(0))
bench("SoA col-scatter [16,NC] -> [16,131k]",
      lambda s: chain(lambda t: jnp.zeros((D, P), jnp.float32)
                      .at[:, gg].add(updT + t,
                                     mode="promise_in_bounds"), s),
      jnp.float32(0))
bench("transpose [1.28M,16] -> [16,1.28M]",
      lambda s: chain(lambda t: (big + t).T.copy() if False else
                      jnp.swapaxes(big + t, 0, 1), s),
      jnp.float32(0))
bench("elementwise pass [1.28M,16] (bandwidth ref)",
      lambda s: chain(lambda t: big * (1.0 + t), s),
      jnp.float32(0))
bench("elementwise pass [1.28M,128] (bandwidth ref)",
      lambda s: chain(lambda t: jnp.zeros((N, 128), jnp.float32) + t, s),
      jnp.float32(0))
print("done", flush=True)
