"""Adaptive density control under static shapes (jit-safe).

The reference grows/shrinks its parameter tensors every 100 iterations
(`scene/gaussian_model.py:927-1062`: clone small high-grad splats, split
large ones into N=2 with scale/1.6, prune transparent/huge ones) and
rebuilds the Adam state around the surgery (`:810-878`).  Dynamic shapes
would force an XLA recompile every time, so here capacity is fixed and
densification is pure array surgery:

  * splats live in a fixed [N] slot array with an `alive` mask;
  * prune = clear alive bits;
  * clone/split = match *requests* (ranked by prefix-sum) to *free slots*
    (ranked the same way) and gather-copy source params into them;
  * Adam moments at every touched slot are zeroed, matching the
    reference's zero-init of appended tensors (`cat_tensors_to_optimizer`).

Everything is O(N) gathers/scatters + two sorts — no host round trip, no
recompile.  When the live count approaches capacity the caller re-pads
(a rare, host-side event).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import transforms as tf
from . import gaussians as G


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """Thresholds (reference `arguments/__init__.py:96-108`, `train.py:172-185`)."""
    grad_threshold: float = 0.0002        # densify_grad_threshold
    grad_normal_threshold: float = 4e-6   # densify_grad_normal_threshold
    percent_dense: float = 0.001
    min_opacity: float = 0.005
    split_n: int = 2
    split_scale_div: float = 1.6          # 0.8 * N
    prune_big_ws: float = 0.1             # 0.1 * extent world-size prune


def add_stats(
    state: G.GaussianState,
    xy_grad: jnp.ndarray,
    normal_grad: jnp.ndarray,
    radii: jnp.ndarray,
    visible: jnp.ndarray,
    width: int | None = None,
    height: int | None = None,
) -> G.GaussianState:
    """Accumulate per-splat screen-gradient stats after a backward pass.

    Mirrors `add_densification_stats` (`gaussian_model.py:1055-1061`):
    the xy screen-space gradient norm and the normal gradient norm are
    summed over iterations where the splat was visible.

    Two unit conventions matter for threshold parity with the reference:

    * The reference's viewspace gradient is expressed in **NDC** units —
      its CUDA backward multiplies the pixel-space gradient by
      `ddelx_dx = 0.5 * W` / `ddely_dy = 0.5 * H`
      (`backward.cu:481-482,601-602`) before the densify threshold
      0.0002 is applied.  Our `xy_offset` is added in *pixel*
      coordinates (`ops/projection.py:123-124`), so the raw gradient is
      a pixel-space gradient; pass `width`/`height` to apply the same
      0.5·W / 0.5·H scaling (at 800² the difference is a factor of 400
      in effective threshold — leaving it out under-densifies so badly
      that training plateaus).

    * The reference's normal trigger accumulates the norm of the
      **normalized** gradient, `norm(F.normalize(grad, eps=1e-3))`
      (`gaussian_model.py:1059-1061` with `normal_activation` from
      `:30`).  That value is ≈1 for any visible splat whose normal
      gradient exceeds ~1e-3 — against the 4e-6 threshold the trigger
      effectively selects *every visible splat* whenever a normal loss
      is active.  Quirk or not, it is the behavior the reference's
      published quality comes from, so it is matched exactly here.

    Args:
      xy_grad: [N, 2] d(loss)/d(screen xy in pixels) — from the
        rasterizer's `xy_offset` zero input.
      normal_grad: [N, 3] d(loss)/d(normal param).
      radii: [N] int32 current screen radii; visible: [N] bool.
      width, height: image size for the pixel→NDC gradient scale; None
        keeps raw pixel units (tests / legacy callers).
    """
    if width is not None:
        xy_grad = xy_grad * jnp.asarray(
            [0.5 * width, 0.5 * (height if height is not None else width)],
            xy_grad.dtype)
    gnorm = jnp.linalg.norm(xy_grad, axis=-1)
    nnorm = jnp.linalg.norm(tf.normalize(normal_grad, eps=1e-3), axis=-1)
    vis = visible & state.alive
    return state.replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(vis, gnorm, 0.0),
        normal_grad_accum=state.normal_grad_accum + jnp.where(vis, nnorm, 0.0),
        denom=state.denom + vis.astype(state.denom.dtype),
        max_radii2d=jnp.maximum(state.max_radii2d,
                                jnp.where(vis, radii, 0)),
    )


def _rank(mask: jnp.ndarray) -> jnp.ndarray:
    """0-based rank of each True element among Trues (False → large)."""
    c = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return jnp.where(mask, c, jnp.iinfo(jnp.int32).max)


def densify_and_prune(
    state: G.GaussianState,
    opt_state: Any,
    cfg: DensifyConfig,
    scene_extent: float,
    rng: jax.Array,
    max_screen_size: int = 0,
) -> tuple[G.GaussianState, Any, dict[str, jnp.ndarray]]:
    """One densify+prune round (reference `densify_and_prune`,
    `gaussian_model.py:1023-1043`).

    Args:
      state: current gaussians; opt_state: optax state whose param-shaped
        leaves (Adam mu/nu) are zeroed at touched slots.
      scene_extent: cameras' nerf-normalization radius.
      rng: PRNG key for split position sampling.
      max_screen_size: if >0, prune splats whose max 2D radius exceeded it.

    Returns:
      (new_state, new_opt_state, info dict).
    """
    p = state.params
    N = p.capacity
    denom = jnp.maximum(state.denom, 1e-12)
    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / denom, 0.0)
    grads_n = jnp.where(state.denom > 0,
                        state.normal_grad_accum / denom, 0.0)

    scaling = G.get_scaling(p)
    max_scale = jnp.max(scaling, axis=-1)
    opacity = G.get_opacity(p)

    hot = (grads >= cfg.grad_threshold) | (grads_n >= cfg.grad_normal_threshold)
    small = max_scale <= cfg.percent_dense * scene_extent
    sel_clone = state.alive & hot & small
    sel_split = state.alive & hot & ~small

    # --- prune: transparent, huge-world, and split originals ---
    # NOTE on the big-screen prune: the reference's
    # `big_points_vs = max_radii2D > max_screen_size`
    # (`gaussian_model.py:1036-1038`) NEVER fires in practice, because
    # `densify_and_clone`/`densify_and_split` run first inside
    # `densify_and_prune` and their `densification_postfix` zeroes the
    # whole `max_radii2D` array (`gaussian_model.py:916`) before the
    # prune reads it.  An earlier round here applied the screen prune
    # literally and it wiped 37k→6k splats at the first post-reset
    # round (accumulated radii > 20 px are common at 800²); matching
    # the reference's *effective* behavior — world-size prune only —
    # is what its published quality comes from.
    prune = opacity < cfg.min_opacity
    prune_ws = jnp.zeros_like(prune)
    if max_screen_size:
        prune_ws = max_scale > cfg.prune_big_ws * scene_extent
        prune = prune | prune_ws
    # Non-finite splats are dead weight (projection culls NaNs, so they
    # render as nothing) and poison any split/clone that copies them —
    # prune them and report the count (`pruned_nonfinite`).
    finite = (jnp.isfinite(p.xyz).all(-1) & jnp.isfinite(p.scaling).all(-1)
              & jnp.isfinite(p.rotation).all(-1)
              & jnp.isfinite(p.opacity).all(-1))
    prune = prune | ~finite
    # Opacity-pruned splats are excluded as clone/split sources: the
    # reference technically creates their children first, but the prune
    # mask is evaluated on the post-split array and the children inherit
    # the sub-threshold opacity, so they die in the same round
    # (`gaussian_model.py:1031-1042`) — net effect: no copies.  (ws-
    # pruned splats stay split-eligible: their /1.6-scaled children can
    # escape the world-size prune in the reference and survive.)
    dead_src = ~finite | (opacity < cfg.min_opacity)
    sel_clone = sel_clone & ~dead_src
    sel_split = sel_split & ~dead_src
    alive_after = state.alive & ~prune & ~sel_split

    # --- requests: split children first, then clones ---
    # Each split frees its own slot (the original is killed above), so
    # free >= num_split and every split's FIRST child is guaranteed a
    # slot even at full capacity.  Ranking clones first (the reference's
    # append order) is only safe with dynamic growth — at a static
    # capacity it lets clones consume the slots the split originals
    # freed, deleting splats outright.  When everything fits the order
    # is irrelevant, so reference parity is unaffected.
    n_copies = 1 + cfg.split_n
    req_valid = jnp.concatenate(
        [sel_split] * cfg.split_n + [sel_clone])          # [n_copies*N]
    req_src = jnp.tile(jnp.arange(N, dtype=jnp.int32), n_copies)
    req_is_split = jnp.concatenate(
        [jnp.ones(N, bool)] * cfg.split_n + [jnp.zeros(N, bool)])
    req_rank = _rank(req_valid)

    free = ~alive_after
    free_rank = _rank(free)
    num_free = jnp.sum(free)
    num_req = jnp.sum(req_valid)
    n_place = jnp.minimum(num_free, num_req)

    # slot_for_rank[r] = index of the r-th free slot
    order = jnp.argsort(jnp.where(free, jnp.arange(N), N).astype(jnp.int32))
    # For requests with rank < n_place: destination slot.
    fulfilled = req_valid & (req_rank < n_place)
    dest = jnp.where(fulfilled, order[jnp.clip(req_rank, 0, N - 1)], N)

    # Scatter request → slot maps (per-slot source index and split flag);
    # unfulfilled requests carry dest == N and are dropped by the scatter.
    src_of_slot = jnp.full(N, -1, jnp.int32).at[dest].set(
        req_src, mode="drop")
    split_of_slot = jnp.zeros(N, bool).at[dest].set(
        req_is_split, mode="drop")
    newly = src_of_slot >= 0
    src = jnp.maximum(src_of_slot, 0)

    # --- build new params: copy from src, adjust for splits ---
    rot = tf.normalize(p.rotation[src])
    Rm = tf.quat_to_rotmat(rot)
    stds = scaling[src]
    noise = jax.random.normal(rng, (N, 3), p.xyz.dtype) * stds
    offset = jnp.einsum("nij,nj->ni", Rm, noise)
    split_xyz = p.xyz[src] + offset
    split_scaling = jnp.log(
        jnp.maximum(scaling[src] / cfg.split_scale_div, 1e-12))

    def place(old, new):
        m = newly.reshape((N,) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    new_params = G.GaussianParams(
        xyz=place(p.xyz, jnp.where(split_of_slot[:, None],
                                   split_xyz, p.xyz[src])),
        normal=place(p.normal, p.normal[src]),
        shs_dc=place(p.shs_dc, p.shs_dc[src]),
        shs_rest=place(p.shs_rest, p.shs_rest[src]),
        scaling=place(p.scaling, jnp.where(split_of_slot[:, None],
                                           split_scaling, p.scaling[src])),
        rotation=place(p.rotation, p.rotation[src]),
        opacity=place(p.opacity, p.opacity[src]),
        base_color=place(p.base_color, p.base_color[src]),
        roughness=place(p.roughness, p.roughness[src]),
        metallic=place(p.metallic, p.metallic[src]),
        incidents_dc=place(p.incidents_dc, p.incidents_dc[src]),
        incidents_rest=place(p.incidents_rest, p.incidents_rest[src]),
        visibility_dc=place(p.visibility_dc, p.visibility_dc[src]),
        visibility_rest=place(p.visibility_rest, p.visibility_rest[src]),
    )
    new_alive = alive_after | newly

    # --- optimizer state: zero moments at touched (new or dead) slots ---
    touched = newly | ~new_alive
    opt_state = zero_opt_state_at(opt_state, touched, N)

    new_state = G.GaussianState(
        params=new_params,
        alive=new_alive,
        xyz_grad_accum=jnp.zeros(N, jnp.float32),
        normal_grad_accum=jnp.zeros(N, jnp.float32),
        denom=jnp.zeros(N, jnp.float32),
        max_radii2d=jnp.zeros(N, jnp.int32),
    )
    info = {
        "num_cloned": jnp.sum(sel_clone),
        "num_split": jnp.sum(sel_split),
        "num_pruned": jnp.sum(state.alive & prune),
        "num_alive": jnp.sum(new_alive),
        "overflow": jnp.maximum(num_req - num_free, 0),
        "pruned_nonfinite": jnp.sum(state.alive & ~finite),
        "pruned_opacity": jnp.sum(
            state.alive & (opacity < cfg.min_opacity)),
        "pruned_ws": jnp.sum(state.alive & prune_ws),
    }
    return new_state, opt_state, info


def zero_opt_state_at(opt_state: Any, mask: jnp.ndarray, capacity: int
                      ) -> Any:
    """Zero param-shaped optimizer-state leaves at masked slots.

    Adam's mu/nu (and any other per-param moment) have the same leading
    dim as the params; leaves that don't (counters, schedules) pass
    through untouched.
    """
    def fix(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 \
                and leaf.shape[0] == capacity and jnp.issubdtype(
                    leaf.dtype, jnp.floating):
            m = mask.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, 0.0, leaf)
        return leaf
    return jax.tree.map(fix, opt_state)


def reset_opacity(state: G.GaussianState, opt_state: Any,
                  ceiling: float = 0.01) -> tuple[G.GaussianState, Any]:
    """Clamp all opacities to <= ceiling and clear their Adam moments
    (reference `reset_opacity`, `gaussian_model.py:688-691`)."""
    p = state.params
    op = G.get_opacity(p)
    new_raw = jnp.log(jnp.minimum(op, ceiling) /
                      (1.0 - jnp.minimum(op, ceiling)))[:, None]
    new_params = p.replace(opacity=new_raw)
    # Zero only the opacity leaf: walk the pytree for GaussianParams-shaped
    # nodes (optax.multi_transform wraps other labels' slots in MaskedNode
    # placeholders, which must pass through untouched).
    def fix(leaf):
        if isinstance(leaf, G.GaussianParams) and \
                isinstance(leaf.opacity, jnp.ndarray):
            return leaf.replace(opacity=jnp.zeros_like(leaf.opacity))
        return leaf
    opt_state = jax.tree.map(
        fix, opt_state, is_leaf=lambda x: isinstance(x, G.GaussianParams))
    return state.replace(params=new_params), opt_state
