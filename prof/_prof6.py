import time
import numpy as np
import jax, jax.numpy as jnp

def timeit(name, fn, *args, n=8):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {np.median(ts)*1000:8.1f} ms", flush=True)
    return out

N = 131_072 * 32
rng = np.random.default_rng(0)
tile = jnp.asarray(rng.integers(0, 2501, N).astype(np.int32))
depth = jnp.asarray(rng.uniform(0.2, 10, N).astype(np.float32))
gid = jnp.asarray(np.arange(N, dtype=np.int32))

@jax.jit
def sort3(tile, depth, gid):
    return jax.lax.sort((tile, depth, gid), dimension=0, num_keys=2,
                        is_stable=False)
timeit("sort 2-key (i32,f32)+payload", sort3, tile, depth, gid)

@jax.jit
def sort_packed(tile, depth, gid):
    bits = jax.lax.bitcast_convert_type(depth, jnp.uint32)
    key = (tile.astype(jnp.uint32) << 20) | (bits >> 12)
    return jax.lax.sort((key, gid), dimension=0, num_keys=1,
                        is_stable=False)
timeit("sort packed-u32 + payload", sort_packed, tile, depth, gid)

@jax.jit
def sort_packed_i32(tile, depth, gid):
    bits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    key = (tile << 20) | (bits >> 12)  # depths>0 → bits>0, top bit 0
    return jax.lax.sort((key, gid), dimension=0, num_keys=1,
                        is_stable=False)
timeit("sort packed-i32 + payload", sort_packed_i32, tile, depth, gid)

@jax.jit
def argsortv(tile, depth):
    bits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    key = (tile << 20) | (bits >> 12)
    return jnp.argsort(key)
timeit("argsort packed-i32", argsortv, tile, depth)

# half-size (M=16)
Nh = N // 2
timeit("sort 2-key half size", sort3, tile[:Nh], depth[:Nh], gid[:Nh])

# SH eval: einsum vs elementwise
P = 131_072
sh = jnp.asarray(rng.normal(size=(P, 3, 16)).astype(np.float32))
basis = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
@jax.jit
def sh_einsum(sh, basis):
    return jnp.einsum("pck,pk->pc", sh, basis)
timeit("SH einsum [P,3,16]x[P,16]", sh_einsum, sh, basis)
@jax.jit
def sh_elem(sh, basis):
    return jnp.sum(sh * basis[:, None, :], axis=-1)
timeit("SH elementwise reduce", sh_elem, sh, basis)
print("done", flush=True)
