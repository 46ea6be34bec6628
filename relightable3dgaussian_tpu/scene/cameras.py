"""Camera state: matrices, intrinsics, per-pixel rays, ground-truth images.

Functional analogue of the reference `scene/cameras.py:8-137` (which is an
nn.Module holding tensors).  Matrices are stored in natural math convention
(`y = M @ x`); the reference's transposed-storage quirk is not replicated.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..ops import transforms as tf


@dataclasses.dataclass(frozen=True)
class Camera:
    """One view.  Numpy-backed; convert fields with `jnp.asarray` at use."""
    uid: int
    width: int
    height: int
    fovx: float
    fovy: float
    w2c: np.ndarray                 # [4, 4] world→camera
    proj: np.ndarray                # [4, 4] camera→clip
    image: np.ndarray | None = None         # [H, W, 3] float32 in [0,1]
    image_name: str = ""
    gt_alpha_mask: np.ndarray | None = None  # [H, W] float32
    depth: np.ndarray | None = None          # [H, W] MVS prior
    normal: np.ndarray | None = None         # [H, W, 3] MVS prior
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def full_proj(self) -> np.ndarray:
        return self.proj @ self.w2c

    @property
    def c2w(self) -> np.ndarray:
        return np.linalg.inv(self.w2c)

    @property
    def camera_center(self) -> np.ndarray:
        return self.c2w[:3, 3]

    @property
    def focal(self) -> np.ndarray:
        return np.array(
            [tf.fov2focal(self.fovx, self.width),
             tf.fov2focal(self.fovy, self.height)], np.float32)

    @property
    def tan_fov(self) -> np.ndarray:
        return np.array(
            [math.tan(self.fovx * 0.5), math.tan(self.fovy * 0.5)],
            np.float32)

    @property
    def intrinsics(self) -> np.ndarray:
        """3x3 K matrix with principal point at the image center
        (reference `cameras.py:77-85` convention: cx = W/2 - 0.5)."""
        fx, fy = self.focal
        return np.array(
            [[fx, 0.0, self.width / 2 - 0.5],
             [0.0, fy, self.height / 2 - 0.5],
             [0.0, 0.0, 1.0]], np.float32)

    def ray_directions(self) -> np.ndarray:
        """[H, W, 3] world-space unit rays through pixel centers."""
        K = self.intrinsics
        u, v = np.meshgrid(
            np.arange(self.width, dtype=np.float32),
            np.arange(self.height, dtype=np.float32))
        d_cam = np.stack(
            [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1],
             np.ones_like(u)], -1)
        d_world = d_cam @ self.c2w[:3, :3].T
        return d_world / np.linalg.norm(d_world, axis=-1, keepdims=True)

    def render_inputs(self) -> dict:
        """The jnp-ready camera arguments `ops.rasterize` wants."""
        return dict(
            w2c=self.w2c.astype(np.float32),
            full_proj=self.full_proj.astype(np.float32),
            campos=self.camera_center.astype(np.float32),
            focal=self.focal,
            tan_fov=self.tan_fov,
        )


def downscale_camera(cam: Camera, factor: int) -> Camera:
    """Return a camera with image/masks/priors resized by 1/factor
    (reference `camera_utils.py:14-77`, which also caps resolution at
    1.6k — callers pick the factor)."""
    if factor <= 1:
        return cam
    import dataclasses as _dc
    from PIL import Image

    W, H = cam.width // factor, cam.height // factor

    def rs(img, channels=True):
        if img is None:
            return None
        arr = np.asarray(img)
        mode = "F" if arr.ndim == 2 else None
        if arr.ndim == 2:
            out = np.asarray(Image.fromarray(arr.astype(np.float32),
                                             mode="F").resize((W, H)))
        else:
            chans = [np.asarray(Image.fromarray(
                arr[..., c].astype(np.float32), mode="F").resize((W, H)))
                for c in range(arr.shape[-1])]
            out = np.stack(chans, -1)
        return out.astype(np.float32)

    return _dc.replace(
        cam, width=W, height=H,
        image=rs(cam.image), gt_alpha_mask=rs(cam.gt_alpha_mask),
        depth=rs(cam.depth), normal=rs(cam.normal))


def make_camera(
    uid: int,
    R: np.ndarray,
    t: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    image: np.ndarray | None = None,
    image_name: str = "",
    gt_alpha_mask: np.ndarray | None = None,
    depth: np.ndarray | None = None,
    normal: np.ndarray | None = None,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
    znear: float = 0.01,
    zfar: float = 100.0,
    cxcy: tuple[float, float] | None = None,
) -> Camera:
    """Build a Camera from COLMAP-style (R, t) extrinsics.

    R is the c2w rotation as stored by the dataset readers (reference
    convention); t is the w2c translation.
    """
    w2c = tf.world_to_view(R, t, translate=translate, scale=scale)
    if cxcy is None:
        proj = tf.projection_matrix(znear, zfar, fovx, fovy)
    else:
        proj = tf.projection_matrix_center_shift(
            znear, zfar, cxcy[0], cxcy[1],
            tf.fov2focal(fovx, width), tf.fov2focal(fovy, height),
            width, height)
    return Camera(
        uid=uid, width=width, height=height, fovx=fovx, fovy=fovy,
        w2c=w2c, proj=proj, image=image, image_name=image_name,
        gt_alpha_mask=gt_alpha_mask, depth=depth, normal=normal,
        znear=znear, zfar=zfar)
