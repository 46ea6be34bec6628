"""COLMAP sparse-model parser (binary and text).

Fresh implementation of the subset the pipeline needs — cameras.bin /
images.bin / points3D.bin (and their .txt fallbacks) — mirroring the
formats handled by the reference `scene/colmap_loader.py`.
"""
from __future__ import annotations

import dataclasses
import os
import struct

import numpy as np

# COLMAP camera model ids → (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


@dataclasses.dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclasses.dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray
    tvec: np.ndarray
    camera_id: int
    name: str


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _read(f, fmt: str):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_intrinsics(sparse_dir: str) -> dict[int, ColmapCamera]:
    bin_path = os.path.join(sparse_dir, "cameras.bin")
    txt_path = os.path.join(sparse_dir, "cameras.txt")
    out: dict[int, ColmapCamera] = {}
    if os.path.exists(bin_path):
        with open(bin_path, "rb") as f:
            (n,) = _read(f, "<Q")
            for _ in range(n):
                cam_id, model_id, w, h = _read(f, "<iiQQ")
                name, np_ = CAMERA_MODELS[model_id]
                params = np.array(_read(f, f"<{np_}d"))
                out[cam_id] = ColmapCamera(cam_id, name, int(w), int(h),
                                           params)
    else:
        with open(txt_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                cam_id = int(parts[0])
                out[cam_id] = ColmapCamera(
                    cam_id, parts[1], int(parts[2]), int(parts[3]),
                    np.array([float(p) for p in parts[4:]]))
    return out


def read_extrinsics(sparse_dir: str) -> dict[int, ColmapImage]:
    bin_path = os.path.join(sparse_dir, "images.bin")
    txt_path = os.path.join(sparse_dir, "images.txt")
    out: dict[int, ColmapImage] = {}
    if os.path.exists(bin_path):
        with open(bin_path, "rb") as f:
            (n,) = _read(f, "<Q")
            for _ in range(n):
                img_id = _read(f, "<i")[0]
                qvec = np.array(_read(f, "<4d"))
                tvec = np.array(_read(f, "<3d"))
                cam_id = _read(f, "<i")[0]
                name = b""
                while True:
                    c = f.read(1)
                    if c == b"\x00":
                        break
                    name += c
                (npts,) = _read(f, "<Q")
                f.read(24 * npts)  # skip 2D points (x, y, point3D_id)
                out[img_id] = ColmapImage(
                    img_id, qvec, tvec, cam_id, name.decode())
    else:
        with open(txt_path) as f:
            lines = [ln.strip() for ln in f
                     if ln.strip() and not ln.startswith("#")]
        for meta in lines[0::2]:
            parts = meta.split()
            img_id = int(parts[0])
            out[img_id] = ColmapImage(
                img_id,
                np.array([float(x) for x in parts[1:5]]),
                np.array([float(x) for x in parts[5:8]]),
                int(parts[8]), parts[9])
    return out


def read_points3d(sparse_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """→ (xyz [P,3] float32, rgb01 [P,3] float32)."""
    bin_path = os.path.join(sparse_dir, "points3D.bin")
    txt_path = os.path.join(sparse_dir, "points3D.txt")
    xyzs, rgbs = [], []
    if os.path.exists(bin_path):
        with open(bin_path, "rb") as f:
            (n,) = _read(f, "<Q")
            for _ in range(n):
                _pid = _read(f, "<Q")[0]
                xyz = _read(f, "<3d")
                rgb = _read(f, "<3B")
                _err = _read(f, "<d")
                (track_len,) = _read(f, "<Q")
                f.read(8 * track_len)
                xyzs.append(xyz)
                rgbs.append(rgb)
    else:
        with open(txt_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                xyzs.append([float(x) for x in parts[1:4]])
                rgbs.append([float(x) for x in parts[4:7]])
    xyz = np.array(xyzs, np.float32)
    rgb = np.array(rgbs, np.float32) / 255.0
    return xyz, rgb


def read_points3d_tracks(sparse_dir: str
                         ) -> tuple[np.ndarray, np.ndarray]:
    """→ (xyz [P,3] float32, tracks [N,2] int64 rows (point_idx,
    image_id)) — the SfM co-visibility data MVS view-pair scoring
    consumes (the reference reads the same track lists through
    `images[i].point3D_ids`, `colmap2mvsnet.py:29-266`)."""
    bin_path = os.path.join(sparse_dir, "points3D.bin")
    txt_path = os.path.join(sparse_dir, "points3D.txt")
    xyzs: list = []
    track_rows: list = []
    if os.path.exists(bin_path):
        with open(bin_path, "rb") as f:
            (n,) = _read(f, "<Q")
            for pi in range(n):
                _pid = _read(f, "<Q")[0]
                xyz = _read(f, "<3d")
                _read(f, "<3B")
                _read(f, "<d")
                (track_len,) = _read(f, "<Q")
                elems = _read(f, f"<{2 * track_len}i")
                for k in range(track_len):
                    track_rows.append((pi, elems[2 * k]))
                xyzs.append(xyz)
    else:
        with open(txt_path) as f:
            pi = 0
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                xyzs.append([float(x) for x in parts[1:4]])
                for k in range(8, len(parts), 2):
                    track_rows.append((pi, int(parts[k])))
                pi += 1
    xyz = np.array(xyzs, np.float32).reshape(-1, 3)
    tracks = (np.array(track_rows, np.int64).reshape(-1, 2)
              if track_rows else np.zeros((0, 2), np.int64))
    return xyz, tracks
