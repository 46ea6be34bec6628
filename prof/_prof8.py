"""Round-2 perf probes: gather/scatter width scaling, chunk variants, SSIM."""
import time
import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops import losses
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {np.median(ts)*1000:8.2f} ms", flush=True)
    return out


rng = np.random.default_rng(0)

# ---------- gather / scatter microbenchmarks ----------
P = 131_072
N = 1_280_000  # ~T*K rows
idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
print("== row-gather jnp.take(packed[P,D], idx[1.28M]) ==", flush=True)
for D, dt in [(1, np.float32), (4, np.float32), (8, np.float32),
              (14, np.float32), (16, np.float32), (32, np.float32),
              (14, np.float16), (16, np.float16)]:
    packed = jnp.asarray(rng.uniform(size=(P, D)).astype(np.float32))
    if dt == np.float16:
        packed = packed.astype(jnp.bfloat16)
        tag = f"D={D} bf16"
    else:
        tag = f"D={D} f32"
    f = jax.jit(lambda p, i: jnp.take(p, i, axis=0))
    timeit(f"take {tag}", f, packed, idx)

print("== scatter-add (transpose of take) ==", flush=True)
for D, dt in [(14, np.float32), (14, np.float16)]:
    packed = jnp.asarray(rng.uniform(size=(P, D)).astype(np.float32))
    if dt == np.float16:
        packed = packed.astype(jnp.bfloat16)
        tag = f"D={D} bf16"
    else:
        tag = f"D={D} f32"
    g = jnp.ones((N, D), packed.dtype)

    def vjp_fn(p, i, g):
        _, vjp = jax.vjp(lambda pp: jnp.take(pp, i, axis=0), p)
        return vjp(g)[0]
    f = jax.jit(vjp_fn)
    timeit(f"scatter {tag}", f, packed, idx, g)

# fewer rows (actual instances vs padded T*K)
idx2 = jnp.asarray(rng.integers(0, P, 800_000).astype(np.int32))
packed = jnp.asarray(rng.uniform(size=(P, 14)).astype(np.float32))
f = jax.jit(lambda p, i: jnp.take(p, i, axis=0))
timeit("take D=14 f32, 800k rows", f, packed, idx2)

# ---------- SSIM old (conv) vs new (shifts) ----------
img1 = jnp.asarray(rng.uniform(size=(800, 800, 3)).astype(np.float32))
img2 = jnp.asarray(rng.uniform(size=(800, 800, 3)).astype(np.float32))
f = jax.jit(lambda a, b: losses.ssim(a, b))
timeit("ssim (shift impl) fwd", f, img1, img2)
f = jax.jit(jax.grad(lambda a, b: losses.ssim(a, b)))
timeit("ssim (shift impl) fwd+bwd", f, img1, img2)

# ---------- full step at chunk variants ----------
W = H = 800
P = 100_000
capacity = 131_072
z = rng.uniform(1.2, 4.0, P)
half = np.tan(0.45) * z
x = rng.uniform(-1, 1, P) * half
y = rng.uniform(-1, 1, P) * half
pts = np.stack([x, y, 2.8 - z], -1).astype(np.float32)
cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
state = G.create_from_points(pts, cols, capacity=capacity,
                             init_scale=np.full(P, 0.012, np.float32))
c = np.array([0.0, 0.0, 2.8])
fwd_v = -c / np.linalg.norm(c)
up = np.array([0.0, 1.0, 0.0])
r = np.cross(fwd_v, up)
dn = np.cross(fwd_v, r)
Rm = np.stack([r, dn, fwd_v], 1)
cam = make_camera(uid=0, R=Rm, t=-Rm.T @ c, fovx=0.9, fovy=0.9,
                  width=W, height=H)
ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
bg = jnp.zeros(3)
target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
loss_cfg = R.LossConfig(lambda_dssim=0.2)

for chunk in (32, 64, 128):
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=32,
                          max_per_tile=512, chunk=chunk)

    @jax.jit
    def fwd_bwd(params):
        def loss_fn(p):
            results = R.render_view(
                p, state.alive, ci, bg, cfg, active_sh_degree=3,
                compute_pseudo_normal=False)
            loss, _ = R.calculate_loss(results, {"image": target}, loss_cfg)
            return loss
        return jax.value_and_grad(loss_fn)(params)

    t0 = time.perf_counter()
    out = fwd_bwd(state.params)
    jax.block_until_ready(out)
    print(f"# chunk={chunk} compile {time.perf_counter()-t0:.0f}s", flush=True)
    timeit(f"FULL step chunk={chunk}", fwd_bwd, state.params)

print("done", flush=True)
