"""Texture loading for the shader stages.

Replaces the reference `asset_processing/textureImport.py` (which
hard-codes absolute Windows paths, SURVEY.md §7.4) and the CUDA texture
manager upload path: textures here are a plain dict name → [H, W, 4]
float array consumed by `models.shaders.sample_texture`.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def load_texture(path: str) -> jnp.ndarray:
    """One image file → [H, W, 4] float32 in [0,1] (RGB padded with
    alpha=1, matching the RGBA pad in `texture.cu:124-170`)."""
    from PIL import Image
    img = np.asarray(Image.open(path)).astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.ones_like(img[..., :1])], axis=-1)
    return jnp.asarray(img[..., :4])


def load_texture_dir(path: str) -> dict[str, jnp.ndarray]:
    """Load every image in a directory; the stem becomes the texture name
    (the shader built-ins look up names like "Cracks", "Turbulence",
    "Depth cracks", "shadow")."""
    out: dict[str, jnp.ndarray] = {}
    if not os.path.isdir(path):
        return out
    for f in sorted(os.listdir(path)):
        stem, ext = os.path.splitext(f)
        if ext.lower() not in (".png", ".jpg", ".jpeg", ".bmp", ".tga"):
            continue
        try:
            out[stem] = load_texture(os.path.join(path, f))
        except Exception:
            continue
    return out
