"""Sharded training step: data parallel over cameras × tile parallel
inside the render.

The reference is strictly single-GPU (SURVEY.md §2.7); this is the
TPU-native scaling design:

  * mesh ("data", "tile");
  * the camera batch is sharded over "data" — each data group trains on
    its own views, gradients are `pmean`'d (the DP axis);
  * inside each render the compositor's tile loop is sharded over
    "tile" via `ops.composite(tile_axis=...)` — members composite a
    contiguous row-block of tiles and `all_gather` the image (the
    renderer's sequence/context-parallel analogue);
  * the backward pass flows through the all_gather (transpose:
    reduce-scatter), and one `pmean` over "tile" reassembles full
    parameter gradients — XLA overlaps these collectives with the
    compositing scan where the scheduler allows.

Parameters and optimizer state are replicated (renderer parameter
counts are ~10⁶ splats × ~60 floats ≈ 240 MB — replication is the right
trade below ~10⁷ splats; the Gaussian-sharded variant is the TP analogue
for beyond that).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import render as R
from ..ops.rasterize import RasterizeConfig
from ..training.trainer import TrainState


def make_sharded_train_step(
    tx: optax.GradientTransformation,
    mesh: Mesh,
    raster_cfg: RasterizeConfig,
    loss_cfg: R.LossConfig,
    sh_deg: int = 3,
):
    """Build the jitted multi-chip train step.

    The returned function takes
      state        — TrainState (replicated),
      cameras      — dict of stacked arrays, leading dim B = global camera
                     batch (w2c [B,4,4], full_proj [B,4,4], campos [B,3],
                     focal [B,2], tan_fov [B,2]),
      gt_images    — [B, H, W, 3],
      bg           — [3],
    and returns (new_state, metrics).  B must divide by the data-axis
    size.  raster_cfg.tile_axis/tile_shards must name the mesh's tile
    axis when its size > 1.
    """
    ndata = mesh.shape["data"]
    ntile = mesh.shape["tile"]
    if ntile > 1:
        assert raster_cfg.tile_axis == "tile", raster_cfg
        assert raster_cfg.tile_shards == ntile, raster_cfg

    def per_camera_loss(params, alive, camera, gt_image, bg):
        results = R.render_view(
            params, alive, camera, bg, raster_cfg,
            active_sh_degree=sh_deg, compute_pseudo_normal=False)
        loss, tb = R.calculate_loss(
            results, {"image": gt_image}, loss_cfg)
        return loss, tb

    def shard_fn(state: TrainState, cameras, gt_images, bg):
        gs = state.gaussians

        def reduce_grads(g):
            # Tile members each hold ntile× their row-block's
            # contribution (all_gather transpose), so pmean over "tile"
            # restores the full gradient; pmean over "data" completes
            # the batch mean.
            return jax.tree.map(
                lambda x: jax.lax.pmean(jax.lax.pmean(x, "tile"),
                                        "data"), g)

        B = gt_images.shape[0]  # cameras per data member
        if B == 1:
            def local_loss(params):
                return per_camera_loss(
                    params, gs.alive,
                    jax.tree.map(lambda x: x[0], cameras),
                    gt_images[0], bg)
            (loss, tb), grads = jax.value_and_grad(
                local_loss, has_aux=True)(gs.params)
            grads = reduce_grads(grads)
        else:
            # Bucketed DP (B > 1 cameras per member): one backward per
            # camera, each bucket's gradients all-reduced IMMEDIATELY —
            # the latency-hiding scheduler turns these into async
            # all-reduce-start/done pairs that overlap the next
            # camera's forward+backward (evidence:
            # tools/overlap_evidence.py --batch 2).  Mathematically
            # identical to one pmean of the batch mean (pmean is
            # linear); the unrolled loop costs compile time ∝ B, so
            # keep per-member batches small.
            loss = 0.0
            tb = None
            grads = None
            for b in range(B):
                cam_b = jax.tree.map(lambda x: x[b], cameras)

                def local_loss(params, cam_b=cam_b, gt_b=gt_images[b]):
                    return per_camera_loss(
                        params, gs.alive, cam_b, gt_b, bg)
                (loss_b, tb_b), g_b = jax.value_and_grad(
                    local_loss, has_aux=True)(gs.params)
                g_b = reduce_grads(g_b)
                loss = loss + loss_b / B
                tb = tb_b if tb is None else jax.tree.map(
                    lambda a, x: a + x, tb, tb_b)
                grads = g_b if grads is None else jax.tree.map(
                    lambda a, x: a + x, grads, g_b)
            grads = jax.tree.map(lambda x: x / B, grads)
            tb = jax.tree.map(lambda x: x / B, tb)

        loss = jax.lax.pmean(loss, "data")
        tb = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), tb)

        alive_b = gs.alive
        grads = jax.tree.map(
            lambda g: jnp.where(
                alive_b.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0),
            grads)
        updates, new_opt = tx.update(grads, state.opt_state, gs.params)
        new_params = optax.apply_updates(gs.params, updates)
        new_state = TrainState(
            gaussians=gs.replace(params=new_params),
            opt_state=new_opt,
            step=state.step + 1)
        tb = dict(tb)
        tb["loss"] = loss
        return new_state, tb

    rep = P()
    batch = P("data")
    cam_specs = dict(
        w2c=batch, full_proj=batch, campos=batch, focal=batch,
        tan_fov=batch)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, cam_specs, batch, rep),
        out_specs=(rep, rep),
        check_vma=False)

    def step(state, cameras, gt_images, bg):
        return mapped(state, cameras, gt_images, bg)

    return jax.jit(step, donate_argnums=(0,))


def make_sharded_pbr_train_step(
    txs: tuple,
    mesh: Mesh,
    raster_cfg: RasterizeConfig,
    loss_cfg: R.LossConfig,
    sh_deg: int = 3,
    sample_num: int = 16,
):
    """Sharded FLAGSHIP (NeILF PBR) training step: splats + env SH +
    gamma optimized jointly, camera batch over "data", compositor tiles
    over "tile" — the full stage-2 step under the mesh."""
    from ..models import neilf as NF
    from ..training.trainer_neilf import PBRTrainState

    tx, tx_env, tx_gamma = txs
    ndata = mesh.shape["data"]
    ntile = mesh.shape["tile"]
    if ntile > 1:
        assert raster_cfg.tile_axis == "tile", raster_cfg
        assert raster_cfg.tile_shards == ntile, raster_cfg

    def shard_fn(state: PBRTrainState, cameras, gt_images, bg, rng):
        gs = state.gaussians

        def local_loss(params, env, gamma):
            def one(cam_gt):
                cam, gt = cam_gt
                res = NF.render_view(
                    params, gs.alive, cam, bg, raster_cfg,
                    env_light=env, gamma=gamma, use_ldr_image=True,
                    sample_num=sample_num, active_sh_degree=sh_deg,
                    is_training=True, rng=rng)
                loss, tb = NF.calculate_loss(res, {"image": gt}, loss_cfg)
                return loss, tb
            losses, tbs = jax.lax.map(one, (cameras, gt_images))
            return jnp.mean(losses), jax.tree.map(jnp.mean, tbs)

        (loss, tb), grads = jax.value_and_grad(
            local_loss, argnums=(0, 1, 2), has_aux=True)(
            gs.params, state.env, state.gamma)
        g_params, g_env, g_gamma = [
            jax.tree.map(
                lambda g: jax.lax.pmean(jax.lax.pmean(g, "tile"), "data"),
                g) for g in grads]
        loss = jax.lax.pmean(loss, "data")

        alive_b = gs.alive
        g_params = jax.tree.map(
            lambda g: jnp.where(
                alive_b.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0),
            g_params)
        upd, opt_state = tx.update(g_params, state.opt_state, gs.params)
        new_params = optax.apply_updates(gs.params, upd)
        upd_e, env_opt = tx_env.update(g_env, state.env_opt, state.env)
        new_env = optax.apply_updates(state.env, upd_e)
        upd_g, gamma_opt = tx_gamma.update(g_gamma, state.gamma_opt)
        new_gamma = optax.apply_updates(state.gamma, upd_g)

        new_state = PBRTrainState(
            gaussians=gs.replace(params=new_params),
            opt_state=opt_state, env=new_env, env_opt=env_opt,
            gamma=new_gamma, gamma_opt=gamma_opt, step=state.step + 1)
        return new_state, {"loss": loss,
                           "psnr_pbr": jax.lax.pmean(
                               tb["psnr_pbr"], "data")}

    rep = P()
    batch = P("data")
    cam_specs = dict(
        w2c=batch, full_proj=batch, campos=batch, focal=batch,
        tan_fov=batch)
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, cam_specs, batch, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Put a pytree on every device of the mesh (fully replicated)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) dim over the mesh's data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(tree, sharding)
