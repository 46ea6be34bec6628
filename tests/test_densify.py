"""Densification state-machine tests: clone/split/prune/reset on the
fixed-capacity slot array (reference behavior:
`scene/gaussian_model.py:927-1062`)."""
import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussian_tpu.models import densify as D
from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.training import optimizer as opt_mod


def make_state(P=32, capacity=64, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(P, 3)).astype(np.float32)
    st = G.create_from_points(
        pts, np.full((P, 3), 0.5, np.float32), capacity=capacity,
        init_scale=np.full(P, scale, np.float32))
    tx = opt_mod.make_optimizer(opt_mod.OptimConfig())
    return st, tx, tx.init(st.params)


def test_clone_small_splats():
    st, tx, opt_state = make_state(scale=0.001)  # small → clone
    st = st.replace(xyz_grad_accum=jnp.where(st.alive, 1.0, 0.0),
                    denom=jnp.ones(64))
    st2, _, info = D.densify_and_prune(
        st, opt_state, D.DensifyConfig(), scene_extent=1.0,
        rng=jax.random.PRNGKey(0))
    assert int(info["num_cloned"]) == 32
    assert int(info["num_split"]) == 0
    assert int(info["num_alive"]) == 64
    # clones copy the source position exactly
    xyz = np.asarray(st2.params.xyz)
    src = np.asarray(st.params.xyz[:32])
    clones = xyz[32:]
    for c in clones:
        assert (np.abs(src - c).sum(-1) < 1e-6).any()


def test_split_large_splats_scale_divided():
    st, tx, opt_state = make_state(scale=0.5)  # large → split
    st = st.replace(xyz_grad_accum=jnp.where(st.alive, 1.0, 0.0),
                    denom=jnp.ones(64))
    st2, _, info = D.densify_and_prune(
        st, opt_state, D.DensifyConfig(), scene_extent=1.0,
        rng=jax.random.PRNGKey(0))
    assert int(info["num_split"]) == 32
    # originals killed, 2 children each (capacity allows 64 total)
    assert int(info["num_alive"]) == 64
    new_scales = np.exp(np.asarray(st2.params.scaling))[
        np.asarray(st2.alive)]
    np.testing.assert_allclose(new_scales, 0.5 / 1.6, rtol=1e-5)


def test_prune_transparent():
    st, tx, opt_state = make_state()
    p = st.params
    # make half the splats transparent
    op = np.array(p.opacity)
    op[:16] = -10.0  # sigmoid → ~0
    st = st.replace(params=p.replace(opacity=jnp.asarray(op)))
    st2, _, info = D.densify_and_prune(
        st, opt_state, D.DensifyConfig(), 1.0, jax.random.PRNGKey(0))
    assert int(info["num_pruned"]) == 16
    assert int(info["num_alive"]) == 16


def test_opt_state_zeroed_for_new_slots():
    st, tx, opt_state = make_state(scale=0.001)
    # dirty the Adam moments
    opt_state = jax.tree.map(
        lambda x: x + 1.0 if isinstance(x, jnp.ndarray)
        and x.dtype == jnp.float32 and x.ndim >= 1 and x.shape[0] == 64
        else x, opt_state)
    st = st.replace(xyz_grad_accum=jnp.where(st.alive, 1.0, 0.0),
                    denom=jnp.ones(64))
    _, opt2, info = D.densify_and_prune(
        st, opt_state, D.DensifyConfig(), 1.0, jax.random.PRNGKey(0))
    leaves = [x for x in jax.tree.leaves(opt2)
              if isinstance(x, jnp.ndarray) and x.ndim >= 1
              and x.shape[0] == 64 and x.dtype == jnp.float32]
    assert leaves
    for leaf in leaves:
        assert np.allclose(np.asarray(leaf)[32:], 0.0)  # new slots zeroed
        assert np.allclose(np.asarray(leaf)[:32], 1.0)  # kept slots intact


def test_reset_opacity_caps_at_ceiling():
    st, tx, opt_state = make_state()
    st2, _ = D.reset_opacity(st, opt_state, ceiling=0.01)
    op = np.asarray(G.get_opacity(st2.params))
    assert (op <= 0.0101).all()


def test_add_stats_accumulates_only_visible():
    st, _, _ = make_state()
    xy_grad = jnp.ones((64, 2))
    n_grad = jnp.ones((64, 3))
    radii = jnp.full(64, 5, jnp.int32)
    visible = jnp.asarray(np.arange(64) < 10)
    st2 = D.add_stats(st, xy_grad, n_grad, radii, visible)
    acc = np.asarray(st2.xyz_grad_accum)
    np.testing.assert_allclose(acc[:10], np.sqrt(2), rtol=1e-6)
    assert (acc[10:] == 0).all()
    assert (np.asarray(st2.max_radii2d)[:10] == 5).all()


def test_add_stats_ndc_gradient_scale():
    """The xyz trigger must see NDC-unit gradients: the reference's CUDA
    backward scales the pixel gradient by 0.5*W / 0.5*H
    (`backward.cu:481-482,601-602`) before the 0.0002 threshold."""
    st, _, _ = make_state()
    xy_grad = jnp.full((64, 2), 1e-3)
    visible = jnp.ones(64, bool)
    st2 = D.add_stats(st, xy_grad, jnp.zeros((64, 3)),
                      jnp.full(64, 1, jnp.int32), visible,
                      width=800, height=600)
    acc = np.asarray(st2.xyz_grad_accum)
    expect = np.linalg.norm([1e-3 * 400, 1e-3 * 300])
    np.testing.assert_allclose(acc[:32], expect, rtol=1e-5)  # alive slots
    assert (acc[32:] == 0).all()                             # padded slots


def test_add_stats_normal_trigger_is_normalized():
    """Reference accumulates norm(F.normalize(grad, eps=1e-3))
    (`gaussian_model.py:1059-1061`): ~1 for any non-tiny gradient, so
    the 4e-6 threshold effectively selects every visible splat with an
    active normal loss.  Match that exactly."""
    st, _, _ = make_state()
    n_grad = np.zeros((64, 3), np.float32)
    n_grad[:10] = 1e-5          # tiny but > eps-scaled cutoff
    n_grad[10:20] = 100.0       # huge
    visible = jnp.ones(64, bool)
    st2 = D.add_stats(st, jnp.zeros((64, 2)), jnp.asarray(n_grad),
                      jnp.full(64, 1, jnp.int32), visible)
    acc = np.asarray(st2.normal_grad_accum)
    # |g| < eps=1e-3 → |g|/eps; |g| >= eps → 1.0
    np.testing.assert_allclose(
        acc[:10], np.sqrt(3) * 1e-5 / 1e-3, rtol=1e-4)
    np.testing.assert_allclose(acc[10:20], 1.0, rtol=1e-5)
    assert (acc[20:] == 0).all()


def test_big_screen_prune_is_a_noop():
    """The reference's screen-size prune never fires (max_radii2D is
    zeroed by densification_postfix before densify_and_prune reads it,
    `gaussian_model.py:916,1036-1038`); only the world-size prune is
    live.  A literal implementation collapsed the round-3 rehearsal."""
    st, tx, opt_state = make_state(scale=0.05)
    st = st.replace(max_radii2d=jnp.full(64, 500, jnp.int32))
    st2, _, info = D.densify_and_prune(
        st, opt_state, D.DensifyConfig(), scene_extent=1.0,
        rng=jax.random.PRNGKey(0), max_screen_size=20)
    assert int(info["num_pruned"]) == 0
    assert int(info["num_alive"]) == 32
    # but the world-size prune IS live under the same gate
    p = st.params
    big = np.array(p.scaling)
    big[:4] = np.log(0.5)       # 0.5 > 0.1 * extent
    st3 = st.replace(params=p.replace(scaling=jnp.asarray(big)))
    _, _, info3 = D.densify_and_prune(
        st3, opt_state, D.DensifyConfig(), scene_extent=1.0,
        rng=jax.random.PRNGKey(0), max_screen_size=20)
    assert int(info3["pruned_ws"]) == 4


def test_split_at_full_capacity_keeps_first_child():
    """At a saturated capacity, a split must never net-delete a splat:
    the original's freed slot hosts its first child (split requests are
    ranked before clones)."""
    st, tx, opt_state = make_state(P=32, capacity=32, scale=0.5)
    st = st.replace(xyz_grad_accum=jnp.where(st.alive, 1.0, 0.0),
                    denom=jnp.ones(32))
    st2, _, info = D.densify_and_prune(
        st, opt_state, D.DensifyConfig(), scene_extent=1.0,
        rng=jax.random.PRNGKey(0))
    # all 32 want to split into 64 but only 32 slots exist: every
    # original is replaced by exactly one /1.6 child, none vanish
    assert int(info["num_split"]) == 32
    assert int(info["num_alive"]) == 32
    assert int(info["overflow"]) == 32
    new_scales = np.exp(np.asarray(st2.params.scaling))[np.asarray(st2.alive)]
    np.testing.assert_allclose(new_scales, 0.5 / 1.6, rtol=1e-5)


def test_transparent_splats_produce_no_copies():
    """Reference net effect: children of an opacity-pruned splat inherit
    its sub-threshold opacity and die in the same round — so no copies
    are produced at all."""
    st, tx, opt_state = make_state(scale=0.5)
    p = st.params
    op = np.array(p.opacity)
    op[:8] = -10.0  # transparent
    st = st.replace(params=p.replace(opacity=jnp.asarray(op)),
                    xyz_grad_accum=jnp.where(st.alive, 1.0, 0.0),
                    denom=jnp.ones(64))
    _, _, info = D.densify_and_prune(
        st, opt_state, D.DensifyConfig(), 1.0, jax.random.PRNGKey(0))
    assert int(info["num_split"]) == 24        # 32 - 8 transparent
    assert int(info["num_pruned"]) == 8
