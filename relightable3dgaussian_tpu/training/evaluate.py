"""Evaluation: per-view renders + PSNR / SSIM / LPIPS metrics.

Analogue of the reference eval loop (`train.py:336-400`) which writes
per-view images and an `eval.txt` with the three metrics.  LPIPS uses
torchmetrics-style VGG features via the local torch (cpu) install when
available and is skipped otherwise (the reference vendors lpipsPyTorch).
"""
from __future__ import annotations

import os
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ..ops import losses


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def visualize_depth(depth: np.ndarray, near: float = 0.2,
                    far: float = 13.0) -> np.ndarray:
    """Turbo-style depth colormap (reference `image_utils.py:6-23`)."""
    x = np.clip((np.nan_to_num(depth) - near) / (far - near), 0, 1)
    # compact turbo polynomial approximation
    r = np.clip(1.55 - np.abs(4.0 * x - 2.9), 0, 1)
    g = np.clip(1.55 - np.abs(4.0 * x - 1.8), 0, 1)
    b = np.clip(1.75 - np.abs(4.0 * x - 0.6), 0, 1)
    return np.stack([r, g, b], -1).astype(np.float32)


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(_to_uint8(img)).save(path)


def lpips(a: np.ndarray, b: np.ndarray) -> float:
    """LPIPS on [H, W, 3] images in [0,1] — self-contained JAX VGG16
    (`training.lpips_jax`).  Real weights via $LPIPS_WEIGHTS (torchvision
    vgg16 .pth); otherwise a reproducible random backbone (reported as
    "lpips_rand" by `lpips_label()`)."""
    from . import lpips_jax
    _, fn = lpips_jax.lpips_fn()
    return float(fn(jnp.asarray(a), jnp.asarray(b)))


def lpips_label() -> str:
    """"lpips" when real VGG weights are loaded, "lpips_rand" otherwise."""
    from . import lpips_jax
    return lpips_jax.lpips_fn()[0]


def evaluate(
    render_fn: Callable[[Any], dict[str, jnp.ndarray]],
    cameras: list,
    out_dir: str | None = None,
    save_images: bool = False,
    compute_lpips: bool = True,
    image_key: str = "render",
) -> dict[str, float]:
    """Render every camera, compare to ground truth, aggregate metrics.

    Args:
      render_fn: camera -> results dict (whatever pipeline).
      cameras: list of `scene.Camera` with .image ground truth.
      image_key: which results entry is the prediction ("render"/"pbr").

    Returns:
      {"psnr": ..., "ssim": ..., "lpips": ...(optional), "n": count}
    """
    psnrs, ssims, lpipss = [], [], []
    for i, cam in enumerate(cameras):
        results = render_fn(cam)
        pred = np.asarray(results[image_key])
        gt = np.asarray(cam.image)
        psnrs.append(float(losses.psnr(jnp.asarray(pred), jnp.asarray(gt))))
        ssims.append(float(losses.ssim(jnp.asarray(pred), jnp.asarray(gt))))
        if compute_lpips:
            lpipss.append(lpips(pred, gt))
        if save_images and out_dir:
            save_image(os.path.join(out_dir, f"{i:05d}_pred.png"), pred)
            save_image(os.path.join(out_dir, f"{i:05d}_gt.png"), gt)

    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
           "n": len(cameras)}
    if lpipss:
        out[lpips_label()] = float(np.mean(lpipss))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "eval.txt"), "w") as f:
            for k, v in out.items():
                f.write(f"{k}: {v}\n")
    return out
