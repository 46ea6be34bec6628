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
