"""Cascaded MVS inference + geometric-consistency filtering.

Analogue of the reference driver (`vismvsnet/test.py`, cascade depth
nums 64/32/16 at 1/8-1/2 scales) and fusion (`vismvsnet/filter.py`:
probability filter, cross-view reprojection consistency, median fusion).
Also converts depth maps to world-space normal maps — the priors the
training losses consume (`lambda_depth`, `lambda_normal_mvs_depth`).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import homography as hg
from . import network as net


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    depth_nums: tuple[int, int, int] = (64, 32, 16)
    interval_ratios: tuple[float, float, float] = (1.0, 0.5, 0.25)
    base: int = 8
    # Post-cascade refinement.  The reference constructs GNRefine but
    # leaves its call commented out (`model_cas.py:406,434`) and imports
    # CSPN unused — both are implemented here and flag-gated, default off
    # to match the reference's effective behavior.
    gn_refine_iters: int = 0
    cspn_iters: int = 0


class MVSNet(nn.Module):
    """Three-stage cascade: coarse full-range sweep at 1/8 scale, then
    refined sweeps around the upsampled depth at 1/4 and 1/2."""
    cfg: CascadeConfig = CascadeConfig()

    @nn.compact
    def __call__(self, ref_img, src_imgs, K_ref, K_srcs, rels,
                 depth_min, depth_max):
        """Args:
          ref_img [H, W, 3]; src_imgs [V, H, W, 3];
          K_ref [3, 3]; K_srcs [V, 3, 3]; rels [V, 4, 4] ref→src;
          depth range scalars.
        Returns:
          dict with per-stage depth maps (at 1/8, 1/4, 1/2 scale) and
          the final probability map.
        """
        feat = net.FeatExt(self.cfg.base)
        ref_f2, ref_f4, ref_f8 = feat(ref_img)
        src_feats = [feat(s) for s in src_imgs]
        V = len(src_imgs)

        def scale_K(K, s):
            S = jnp.asarray([[1 / s, 0, 0], [0, 1 / s, 0], [0, 0, 1.0]],
                            K.dtype)
            return S @ K

        out: dict[str, Any] = {}
        depth = None
        interval = (depth_max - depth_min) / self.cfg.depth_nums[0]
        stages = [(ref_f8, 8, self.cfg.depth_nums[0],
                   self.cfg.interval_ratios[0], [f[2] for f in src_feats]),
                  (ref_f4, 4, self.cfg.depth_nums[1],
                   self.cfg.interval_ratios[1], [f[1] for f in src_feats]),
                  (ref_f2, 2, self.cfg.depth_nums[2],
                   self.cfg.interval_ratios[2], [f[0] for f in src_feats])]

        for si, (ref_f, s, D, ir, sfeats) in enumerate(stages):
            H, W = ref_f.shape[:2]
            Kr = scale_K(K_ref, s)
            if depth is None:
                depths = hg.depth_hypotheses(depth_min, depth_max, D)
                sweep = jnp.broadcast_to(
                    depths[:, None, None], (D, H, W))
            else:
                d_up = jax.image.resize(depth, (H, W), "bilinear")
                half = ir * interval * D / 2
                offs = jnp.linspace(-half, half, D)
                sweep = jnp.maximum(
                    d_up[None] + offs[:, None, None], 1e-3)
                depths = None

            pair_logits, pair_uncerts = [], []
            pair = net.PairStage(self.cfg.base)
            for v in range(V):
                Ks = scale_K(K_srcs[v], s)
                if depths is not None:
                    warped = hg.plane_sweep_warp(
                        sfeats[v], Kr, Ks, rels[v], depths)
                else:
                    # per-pixel sweep: warp each hypothesis slice
                    def warp_slice(d_img):
                        return _warp_depthmap(
                            sfeats[v], Kr, Ks, rels[v], d_img)
                    warped = jax.vmap(warp_slice)(sweep)
                lg, _, un = pair(ref_f, warped)
                pair_logits.append(lg)
                pair_uncerts.append(un)

            prob = net.FuseStage(self.cfg.base)(pair_logits, pair_uncerts)
            depth = jnp.einsum("dhw,dhw->hw", prob, sweep)
            out[f"depth_{s}"] = depth
            out[f"prob_{s}"] = jnp.max(prob, axis=0)

        # Flag-gated refinement on the finest stage (1/2 scale).
        if self.cfg.gn_refine_iters > 0:
            Kr2 = scale_K(K_ref, 2)
            Ks2 = jnp.stack([scale_K(K_srcs[v], 2) for v in range(V)])
            sfeats2 = jnp.stack([f[0] for f in src_feats])
            depth = net.gn_refine(
                depth, ref_f2, sfeats2, Kr2, Ks2, rels,
                iters=self.cfg.gn_refine_iters,
                clamp=self.cfg.interval_ratios[2] * interval
                * self.cfg.depth_nums[2] / 2)
            out["depth_gn"] = depth
        if self.cfg.cspn_iters > 0:
            affinity = net.CSPNAffinity()(ref_f2)
            depth = net.cspn_propagate(affinity, depth,
                                       self.cfg.cspn_iters)
            out["depth_cspn"] = depth
        out["depth"] = depth
        out["prob"] = out["prob_2"]
        return out


def _warp_depthmap(src_feat, K_ref, K_src, rel, depth_img):
    """Warp a source feature map through a per-pixel depth map."""
    H, W = depth_img.shape
    R = rel[:3, :3]
    t = rel[:3, 3]
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    pix = jnp.stack([u, v, jnp.ones_like(u)], -1)
    cam = pix @ jnp.linalg.inv(K_ref).T
    p = (cam * depth_img[..., None]) @ R.T + t
    p = p @ K_src.T
    z = jnp.maximum(p[..., 2], 1e-6)
    return hg._bilinear(src_feat, p[..., 0] / z, p[..., 1] / z)


def depth_to_normal(depth: jnp.ndarray, K: jnp.ndarray,
                    c2w_R: jnp.ndarray) -> jnp.ndarray:
    """Depth map → world-space normals via cross products of camera-space
    position gradients (the prior for lambda_normal_mvs_depth)."""
    H, W = depth.shape
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    xyz = jnp.stack([x, y, depth], -1)
    dx = jnp.roll(xyz, -1, 1) - jnp.roll(xyz, 1, 1)
    dy = jnp.roll(xyz, -1, 0) - jnp.roll(xyz, 1, 0)
    n = jnp.cross(dx, dy)
    n = -n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return n @ c2w_R.T


def reprojection_consistency(
    depth_ref: jnp.ndarray, depth_src: jnp.ndarray,
    K_ref: jnp.ndarray, K_src: jnp.ndarray, rel: jnp.ndarray,
    pix_thresh: float = 1.0, depth_thresh: float = 0.01,
) -> jnp.ndarray:
    """[H, W] bool — reference depths confirmed by a source view
    (reference `vis_filter`, `filter.py:95-113`): reproject into the
    source, read its depth, project back, accept if the round trip lands
    within pix_thresh pixels and relative depth error < depth_thresh."""
    H, W = depth_ref.shape
    R, t = rel[:3, :3], rel[:3, 3]
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    cam = jnp.stack([u, v, jnp.ones_like(u)], -1) @ jnp.linalg.inv(K_ref).T
    p_src = (cam * depth_ref[..., None]) @ R.T + t
    z_src = jnp.maximum(p_src[..., 2], 1e-6)
    uv_src = (p_src @ K_src.T)
    xs = uv_src[..., 0] / z_src
    ys = uv_src[..., 1] / z_src
    d_src = hg._bilinear(depth_src[..., None], xs, ys)[..., 0]

    # back-project the source sample and return to the reference view
    inv = jnp.linalg.inv(jnp.asarray(rel))
    Rb, tb = inv[:3, :3], inv[:3, 3]
    cam_s = jnp.stack([xs, ys, jnp.ones_like(xs)], -1) @ \
        jnp.linalg.inv(K_src).T
    p_ref = (cam_s * d_src[..., None]) @ Rb.T + tb
    z_ref = jnp.maximum(p_ref[..., 2], 1e-6)
    uv_ref = p_ref @ K_ref.T
    xr = uv_ref[..., 0] / z_ref
    yr = uv_ref[..., 1] / z_ref

    pix_err = jnp.sqrt((xr - u) ** 2 + (yr - v) ** 2)
    rel_err = jnp.abs(z_ref - depth_ref) / jnp.maximum(depth_ref, 1e-6)
    return (pix_err < pix_thresh) & (rel_err < depth_thresh) & (d_src > 0)


def estimate_depth(
    params: Any,
    model: MVSNet,
    ref_img: np.ndarray,
    src_imgs: list[np.ndarray],
    K_ref: np.ndarray,
    K_srcs: list[np.ndarray],
    w2c_ref: np.ndarray,
    w2c_srcs: list[np.ndarray],
    depth_range: tuple[float, float],
) -> dict[str, np.ndarray]:
    """Convenience inference wrapper → {"depth", "prob", "normal"}."""
    rels = [np.asarray(w) @ np.linalg.inv(w2c_ref) for w in w2c_srcs]
    out = model.apply(
        params, jnp.asarray(ref_img), jnp.asarray(np.stack(src_imgs)),
        jnp.asarray(K_ref), jnp.asarray(np.stack(K_srcs)),
        jnp.asarray(np.stack(rels)),
        depth_range[0], depth_range[1])
    depth_small = out["depth"]
    H, W = ref_img.shape[:2]
    depth = jax.image.resize(depth_small, (H, W), "bilinear")
    c2w_R = np.linalg.inv(w2c_ref)[:3, :3]
    normal = depth_to_normal(depth, jnp.asarray(K_ref), jnp.asarray(c2w_R))
    return {"depth": np.asarray(depth),
            "prob": np.asarray(jax.image.resize(out["prob"], (H, W),
                                                "bilinear")),
            "normal": np.asarray(normal)}


def view_selection_scores(
    points: np.ndarray,
    cam_centers: list[np.ndarray],
    point_vis: list[np.ndarray],
    theta0: float = 5.0,
    sigma1: float = 1.0,
    sigma2: float = 10.0,
) -> np.ndarray:
    """Pairwise view-selection scores from shared SfM points
    (reference `colmap2mvsnet.calc_score`, `colmap2mvsnet.py:427-441`):
    score(i,j) = Σ over co-visible points of the piecewise triangulation-
    angle kernel exp(−(θ−θ0)²/(2σ²)), σ = σ1 below θ0 (sharp penalty for
    too-small baselines) and σ2 above (gentle fall-off for wide ones)."""
    n = len(cam_centers)
    scores = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            shared = point_vis[i] & point_vis[j]
            if not shared.any():
                continue
            p = points[shared]
            a = cam_centers[i][None] - p
            b = cam_centers[j][None] - p
            cos = np.sum(a * b, -1) / np.maximum(
                np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1),
                1e-9)
            theta = np.degrees(np.arccos(np.clip(cos, -1, 1)))
            sigma = np.where(theta <= theta0, sigma1, sigma2)
            score = np.exp(-((theta - theta0) ** 2) / (2 * sigma ** 2))
            scores[i, j] = scores[j, i] = score.sum()
    return scores


def colmap_view_scores(
    sparse_dir: str,
    image_ids: list[int],
    cam_centers: list[np.ndarray],
    theta0: float = 5.0,
    sigma1: float = 1.0,
    sigma2: float = 10.0,
) -> np.ndarray | None:
    """View-pair score matrix straight from a COLMAP sparse model (the
    colmap2mvsnet driver path): builds per-image point visibility from
    the points3D track lists and applies the piecewise angle kernel.
    Returns None when the model has no usable tracks."""
    from ..scene import colmap as colmap_io

    try:
        xyz, tracks = colmap_io.read_points3d_tracks(sparse_dir)
    except (OSError, ValueError):
        return None
    if len(tracks) == 0 or len(xyz) == 0:
        return None
    id_to_col = {im_id: k for k, im_id in enumerate(image_ids)}
    vis = np.zeros((len(image_ids), len(xyz)), bool)
    for pi, im_id in tracks:
        k = id_to_col.get(int(im_id))
        if k is not None:
            vis[k, pi] = True
    return view_selection_scores(
        xyz, cam_centers, list(vis), theta0, sigma1, sigma2)
