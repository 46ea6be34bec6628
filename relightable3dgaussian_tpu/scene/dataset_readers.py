"""Dataset loaders: Blender (NeRF-synthetic), COLMAP, NeILF.

Functional analogue of the reference `scene/dataset_readers.py` — the
on-disk formats and camera conventions are kept identical (so reference
datasets and checkpoints interoperate), the implementation is fresh and
numpy/PIL-only (no imageio/pyexr hard dependency; EXR is gated).

Detection logic matches `scene/__init__.py:44-56`:
  sparse/           → COLMAP
  transforms_train.json → Blender
  inputs/sfm_scene.json → NeILF
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any

import numpy as np

from ..ops import transforms as tf
from . import colmap as colmap_io
from . import ply as ply_io
from .cameras import Camera, make_camera


@dataclasses.dataclass
class SceneInfo:
    points: np.ndarray            # [P, 3]
    colors: np.ndarray            # [P, 3] in [0,1]
    normals: np.ndarray           # [P, 3]
    train_cameras: list[Camera]
    test_cameras: list[Camera]
    nerf_normalization: dict[str, Any]
    ply_path: str


def load_image(path: str) -> tuple[np.ndarray, bool]:
    """Load an image as float [H, W, C] in [0,1]; returns (img, is_hdr).

    LDR via PIL (reference uses imageio, `dataset_readers.py:56-81`);
    EXR requires cv2/pyexr and raises a clear error if unavailable.
    """
    if "." not in os.path.basename(path):
        import glob
        files = glob.glob(path + ".*")
        if not files:
            raise FileNotFoundError(path)
        path = files[0]
    if path.endswith(".exr"):
        try:
            import cv2
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        except ImportError as e:
            raise ImportError(
                "EXR images need cv2 or pyexr, neither is available") from e
        return np.nan_to_num(img.astype(np.float32)), True
    from PIL import Image
    img = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    return img, False


def load_pfm(path: str) -> np.ndarray:
    """PFM loader (reference `dataset_readers.py:84-114`)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        color = header == b"PF"
        if not color and header != b"Pf":
            raise ValueError("not a PFM file")
        m = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not m:
            raise ValueError("malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
        shape = (height, width, 3) if color else (height, width)
        return np.ascontiguousarray(data.reshape(shape)[::-1])


def nerfpp_norm(cameras: list[Camera]) -> dict[str, Any]:
    """Scene translate/radius from camera centers
    (`getNerfppNorm`, `dataset_readers.py:127-151`)."""
    centers = np.stack([c.camera_center for c in cameras])
    avg = centers.mean(axis=0)
    diagonal = float(np.linalg.norm(centers - avg, axis=-1).max())
    return {"translate": -avg, "radius": diagonal * 1.1}


# ---------------------------------------------------------------------------
# Blender / NeRF-synthetic
# ---------------------------------------------------------------------------

def read_cameras_from_transforms(
    path: str, transforms_file: str, white_background: bool,
    extension: str = ".png", max_cameras: int | None = None,
) -> list[Camera]:
    """Read a transforms_*.json camera list (reference
    `readCamerasFromTransforms`, `dataset_readers.py:305-366`).

    OpenGL/Blender camera axes are flipped to COLMAP convention
    (y down, z forward); alpha channels become masks and composite over
    the chosen background.
    """
    with open(os.path.join(path, transforms_file)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    cams = []
    frames = contents["frames"]
    if max_cameras is not None:
        frames = frames[:max_cameras]
    for idx, frame in enumerate(frames):
        image_path = os.path.join(path, frame["file_path"] + extension)
        c2w = np.array(frame["transform_matrix"], np.float64)
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]

        image, _ = load_image(image_path)
        bg = np.ones(3) if white_background else np.zeros(3)
        mask = np.ones_like(image[..., 0])
        if image.shape[-1] == 4:
            mask = image[..., 3]
            image = image[..., :3] * image[..., 3:4] + bg * (1 - image[..., 3:4])
        H, W = image.shape[:2]
        fovy = tf.focal2fov(tf.fov2focal(fovx, W), H)
        # MVS depth/normal priors (`mvs_prepare.py` output layout;
        # reference loads them next to the images for the
        # lambda_depth / lambda_normal_mvs_depth losses,
        # `dataset_readers.py:345-353`)
        name = os.path.basename(frame["file_path"])
        depth = normal = None
        dpath = os.path.join(path, "extra", "depths", name + ".npy")
        npath = os.path.join(path, "extra", "normals", name + ".npy")
        if os.path.exists(dpath):
            depth = np.load(dpath).astype(np.float32)
        if os.path.exists(npath):
            normal = np.load(npath).astype(np.float32)
        cams.append(make_camera(
            uid=idx, R=R, t=T, fovx=fovx, fovy=fovy, width=W, height=H,
            image=image.astype(np.float32), gt_alpha_mask=mask,
            depth=depth, normal=normal,
            image_name=name,
            znear=0.01, zfar=100.0))
    return cams


def read_nerf_synthetic(path: str, white_background: bool = False,
                        eval_split: bool = True, extension: str = ".png",
                        max_cameras: int | None = None,
                        rng_seed: int = 0, **_: Any) -> SceneInfo:
    """NeRF-synthetic loader (`readNerfSyntheticInfo`,
    `dataset_readers.py:366-403`): 100k random init points in [-1.3, 1.3]³
    when no points3d.ply exists."""
    train = read_cameras_from_transforms(
        path, "transforms_train.json", white_background, extension,
        max_cameras=max_cameras)
    test = []
    if eval_split and os.path.exists(
            os.path.join(path, "transforms_test.json")):
        test = read_cameras_from_transforms(
            path, "transforms_test.json", white_background, extension,
            max_cameras=max_cameras)

    ply_path = os.path.join(path, "points3d.ply")
    if os.path.exists(ply_path):
        points, colors, normals = ply_io.read_points_ply(ply_path)
    else:
        rng = np.random.default_rng(rng_seed)
        n = 100_000
        points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        colors = (rng.random((n, 3)) / 255.0 * 0.28209479177387814 + 0.5
                  ).astype(np.float32)
        normals = rng.normal(size=(n, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        try:
            ply_io.write_points_ply(ply_path, points, colors, normals)
        except OSError:
            pass  # read-only dataset dir — keep the in-memory cloud
    return SceneInfo(
        points=points, colors=colors, normals=normals,
        train_cameras=train, test_cameras=test,
        nerf_normalization=nerfpp_norm(train), ply_path=ply_path)


# ---------------------------------------------------------------------------
# COLMAP
# ---------------------------------------------------------------------------

def read_colmap_scene(path: str, images_dir: str = "images",
                      eval_split: bool = False, llffhold: int = 8,
                      max_cameras: int | None = None, **_: Any) -> SceneInfo:
    """COLMAP loader (`readColmapSceneInfo`, `dataset_readers.py:252-302`).

    Reads sparse/0 binary (or text) model; eval split = every llffhold-th
    camera, or the DTU benchmark's fixed held-out view ids when the
    scene path contains "DTU" (reference `dataset_readers.py:271-273`).
    """
    sparse = os.path.join(path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    cam_intr = colmap_io.read_intrinsics(sparse)
    cam_extr = colmap_io.read_extrinsics(sparse)

    cams = []
    for idx, key in enumerate(sorted(cam_extr)):
        if max_cameras is not None and idx >= max_cameras:
            break
        extr = cam_extr[key]
        intr = cam_intr[extr.camera_id]
        R = colmap_io.qvec2rotmat(extr.qvec).T
        T = np.array(extr.tvec)
        H, W = intr.height, intr.width
        if intr.model == "SIMPLE_PINHOLE":
            fx = fy = intr.params[0]
        elif intr.model == "PINHOLE":
            fx, fy = intr.params[0], intr.params[1]
        else:
            raise ValueError(
                f"unsupported COLMAP camera model {intr.model} "
                "(undistort first)")
        fovx = tf.focal2fov(fx, W)
        fovy = tf.focal2fov(fy, H)

        img_path = os.path.join(path, images_dir, os.path.basename(extr.name))
        image = None
        mask = None
        if os.path.exists(img_path):
            image, _ = load_image(img_path)
            mask_path = os.path.join(path, "masks", os.path.basename(extr.name))
            if os.path.exists(mask_path):
                m, _ = load_image(mask_path)
                mask = m if m.ndim == 2 else m[..., 0]
            if image.shape[-1] == 4:
                image = image[..., :3]
        cams.append(make_camera(
            uid=idx, R=R, t=T, fovx=fovx, fovy=fovy, width=W, height=H,
            image=None if image is None else image.astype(np.float32),
            gt_alpha_mask=mask,
            image_name=os.path.splitext(os.path.basename(extr.name))[0]))

    if "DTU" in path:
        # DTU benchmark convention: fixed held-out view ids
        # (reference `dataset_readers.py:271-273`)
        test_ids = {2, 12, 17, 30, 34}
        train = [c for i, c in enumerate(cams) if i not in test_ids]
        test = [c for i, c in enumerate(cams) if i in test_ids]
    elif eval_split:
        train = [c for i, c in enumerate(cams) if i % llffhold != 0]
        test = [c for i, c in enumerate(cams) if i % llffhold == 0]
    else:
        train, test = cams, []

    ply_path = os.path.join(sparse, "points3D.ply")
    if os.path.exists(ply_path):
        points, colors, normals = ply_io.read_points_ply(ply_path)
    else:
        points, colors = colmap_io.read_points3d(sparse)
        normals = np.zeros_like(points)
    return SceneInfo(
        points=points, colors=colors, normals=normals,
        train_cameras=train, test_cameras=test,
        nerf_normalization=nerfpp_norm(train or cams), ply_path=ply_path)


# ---------------------------------------------------------------------------
# NeILF (inputs/sfm_scene.json)
# ---------------------------------------------------------------------------

def read_neilf_scene(path: str, eval_split: bool = True,
                     max_cameras: int | None = None, **_: Any) -> SceneInfo:
    """NeILF-format loader (`readNeILFInfo`, `dataset_readers.py:406-544`):
    sfm_scene.json with per-view K/W2C, images in inputs/images, optional
    bbox rescale, every 8th view as test."""
    with open(os.path.join(path, "inputs/sfm_scene.json")) as f:
        sfm = json.load(f)

    bbox_transform = np.array(
        sfm["bbox_transform"], np.float64).reshape(4, 4)
    # normalize largest bbox axis to 1 (`dataset_readers.py:411-414`)
    s = max(bbox_transform[0, 0], bbox_transform[1, 1])
    bbox_transform = bbox_transform.copy()
    bbox_transform[0, 0] = bbox_transform[1, 1] = bbox_transform[2, 2] = s

    image_list = sfm["image_path"]["file_paths"]
    cams = []
    for idx, (view_id, rel) in enumerate(sorted(
            image_list.items(), key=lambda kv: kv[0])):
        if max_cameras is not None and idx >= max_cameras:
            break
        meta = sfm["camera_track_map"]["images"][view_id]
        K = np.array(meta["intrinsic"]["data"], np.float64).reshape(3, 3)
        w2c = np.array(meta["extrinsic"]["data"], np.float64).reshape(4, 4)
        img_path = os.path.join(path, "inputs/images", os.path.basename(rel))
        image = None
        H = W = None
        if os.path.exists(img_path):
            image, _ = load_image(img_path)
            H, W = image.shape[:2]
        else:
            W, H = int(K[0, 2] * 2), int(K[1, 2] * 2)
        fovx = tf.focal2fov(K[0, 0], W)
        fovy = tf.focal2fov(K[1, 1], H)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]
        cams.append(make_camera(
            uid=idx, R=R, t=T, fovx=fovx, fovy=fovy, width=W, height=H,
            image=None if image is None else image.astype(np.float32),
            cxcy=(float(K[0, 2]), float(K[1, 2])),
            image_name=os.path.basename(rel)))

    if eval_split:
        train = [c for i, c in enumerate(cams) if i % 8 != 0]
        test = [c for i, c in enumerate(cams) if i % 8 == 0]
    else:
        train, test = cams, []

    ply_path = os.path.join(path, "inputs/model/sparse.ply")
    if os.path.exists(ply_path):
        points, colors, normals = ply_io.read_points_ply(ply_path)
    else:
        rng = np.random.default_rng(0)
        points = (rng.random((100_000, 3)) * 2 - 1).astype(np.float32)
        colors = np.full((100_000, 3), 0.5, np.float32)
        normals = np.zeros_like(points)
    return SceneInfo(
        points=points, colors=colors, normals=normals,
        train_cameras=train, test_cameras=test,
        nerf_normalization=nerfpp_norm(train or cams), ply_path=ply_path)


def load_scene(path: str, **kwargs) -> SceneInfo:
    """Auto-detect dataset type (reference `scene/__init__.py:44-56`)."""
    if os.path.exists(os.path.join(path, "sparse")):
        return read_colmap_scene(path, **kwargs)
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        return read_nerf_synthetic(path, **kwargs)
    if os.path.exists(os.path.join(path, "inputs/sfm_scene.json")):
        return read_neilf_scene(path, **kwargs)
    raise ValueError(f"could not recognize scene type for {path}")
