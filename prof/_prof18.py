"""In-step scatter variants: sorted-indices hint, bf16 updates, promise."""
import time
import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops import composite_pallas as cpal
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

rng = np.random.default_rng(0)
W = H = 800
P = 100_000
z = rng.uniform(1.2, 4.0, P)
half = np.tan(0.45) * z
x = rng.uniform(-1, 1, P) * half
y = rng.uniform(-1, 1, P) * half
pts = np.stack([x, y, 2.8 - z], -1).astype(np.float32)
cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
state = G.create_from_points(pts, cols, capacity=131_072,
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
cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=32,
                      max_per_tile=512, chunk=128)


def make_bwd(variant):
    def bwd(Pn, res, g):
        idx, mask = res
        D = g.shape[-1]
        g_flat = g.reshape(-1, D)
        n = g_flat.shape[0]
        idx_flat = idx.reshape(-1)
        spread = jnp.arange(n, dtype=jnp.int32) % Pn
        idx_safe = jnp.where(mask.reshape(-1), idx_flat, spread)
        if variant == "base":
            out = jnp.zeros((Pn, D), g.dtype).at[idx_safe].add(g_flat)
        elif variant == "promise":
            out = jnp.zeros((Pn, D), g.dtype).at[idx_safe].add(
                g_flat, mode="promise_in_bounds")
        elif variant == "sorted":
            iota = jnp.arange(n, dtype=jnp.int32)
            ids_s, perm = jax.lax.sort((idx_safe, iota), dimension=0,
                                       num_keys=1, is_stable=False)
            gs = jnp.take(g_flat, perm, axis=0)
            out = jnp.zeros((Pn, D), g.dtype).at[ids_s].add(
                gs, indices_are_sorted=True, mode="promise_in_bounds")
        elif variant == "bf16":
            out = jnp.zeros((Pn, D), jnp.bfloat16).at[idx_safe].add(
                g_flat.astype(jnp.bfloat16)).astype(jnp.float32)
        return out, None, None
    return bwd


for variant in ("base", "promise", "sorted", "bf16"):
    cpal.gather_rows.defvjp(cpal._gather_rows_fwd, make_bwd(variant))

    @jax.jit
    def fwd_bwd(params):
        def loss_fn(p):
            results = R.render_view(
                p, state.alive, ci, bg, cfg, active_sh_degree=3,
                compute_pseudo_normal=False)
            loss, _ = R.calculate_loss(results, {"image": target}, loss_cfg)
            return loss
        return jax.value_and_grad(loss_fn)(params)

    out = fwd_bwd(state.params)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(10):
            o = fwd_bwd(state.params)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{variant}: {best*1000:.1f} ms/step", flush=True)
print("done", flush=True)
