"""Dataset readers: Blender / COLMAP (binary + text) / NeILF fixtures
generated on the fly, loaded through `load_scene` auto-detection."""
import json
import os
import struct

import numpy as np
import pytest

from relightable3dgaussian_tpu.scene import dataset_readers as dr
from relightable3dgaussian_tpu.scene import ply as ply_io


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


@pytest.fixture()
def blender_scene(tmp_path):
    root = tmp_path / "blender"
    (root / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        a = 2 * np.pi * i / 3
        c2w = np.eye(4)
        c2w[:3, 3] = [2 * np.cos(a), 0.3, 2 * np.sin(a)]
        img = rng.uniform(0, 1, (32, 40, 4)).astype(np.float32)
        _write_png(root / "train" / f"r_{i}.png", img)
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return str(root)


def test_blender_reader(blender_scene):
    info = dr.load_scene(blender_scene, white_background=True,
                         eval_split=False)
    assert len(info.train_cameras) == 3
    cam = info.train_cameras[0]
    assert cam.image.shape == (32, 40, 3)
    assert cam.gt_alpha_mask.shape == (32, 40)
    # white background composited over alpha
    assert cam.image.max() <= 1.0
    assert info.points.shape[0] == 100_000
    assert info.nerf_normalization["radius"] > 0
    # camera center should be on the r=2 orbit (plus y offset)
    np.testing.assert_allclose(
        np.linalg.norm(cam.camera_center), np.sqrt(4 + 0.09), atol=1e-4)


@pytest.fixture()
def colmap_scene(tmp_path):
    root = tmp_path / "colmap"
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    (root / "images").mkdir()
    rng = np.random.default_rng(1)

    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 40, 32))  # id, PINHOLE, W, H
        f.write(struct.pack("<4d", 35.0, 36.0, 20.0, 16.0))

    # images.bin: two views
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0, 0, 0))
            f.write(struct.pack("<3d", 0.1 * i, 0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points
            img = rng.uniform(0, 1, (32, 40, 3))
            _write_png(root / "images" / f"img_{i}.png", img)

    # points3D.bin: 5 points
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 5))
        for j in range(5):
            f.write(struct.pack("<Q", j))
            f.write(struct.pack("<3d", j * 0.1, 0.2, 1.0))
            f.write(struct.pack("<3B", 100, 150, 200))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))
    return str(root)


def test_colmap_reader(colmap_scene):
    info = dr.load_scene(colmap_scene)
    assert len(info.train_cameras) == 2
    cam = info.train_cameras[0]
    assert (cam.width, cam.height) == (40, 32)
    assert cam.image is not None and cam.image.shape == (32, 40, 3)
    assert info.points.shape == (5, 3)
    np.testing.assert_allclose(info.colors[0], [100 / 255, 150 / 255,
                                                200 / 255], atol=1e-6)
    # identity rotation, t=(0,0,2) → camera center (0,0,-2)
    np.testing.assert_allclose(cam.camera_center, [0, 0, -2], atol=1e-5)


@pytest.fixture()
def neilf_scene(tmp_path):
    root = tmp_path / "neilf"
    (root / "inputs" / "images").mkdir(parents=True)
    (root / "inputs" / "model").mkdir(parents=True)
    rng = np.random.default_rng(2)
    K = [[40.0, 0, 20.0], [0, 40.0, 16.0], [0, 0, 1.0]]
    images = {}
    track = {}
    for i in range(2):
        name = f"{i:04d}.png"
        _write_png(root / "inputs" / "images" / name,
                   rng.uniform(0, 1, (32, 40, 3)))
        w2c = np.eye(4)
        w2c[2, 3] = 2.0 + i
        images[str(i)] = f"images/{name}"
        track[str(i)] = {
            "intrinsic": {"data": np.asarray(K).reshape(-1).tolist()},
            "extrinsic": {"data": w2c.reshape(-1).tolist()},
        }
    sfm = {
        "bbox_transform": np.eye(4).reshape(-1).tolist(),
        "image_path": {"file_paths": images},
        "camera_track_map": {"images": track},
    }
    with open(root / "inputs" / "sfm_scene.json", "w") as f:
        json.dump(sfm, f)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    ply_io.write_points_ply(str(root / "inputs" / "model" / "sparse.ply"),
                            pts, np.full((20, 3), 0.5, np.float32))
    return str(root)


def test_neilf_reader(neilf_scene):
    info = dr.load_scene(neilf_scene, eval_split=False)
    assert len(info.train_cameras) == 2
    cam = info.train_cameras[0]
    assert cam.image.shape == (32, 40, 3)
    assert info.points.shape == (20, 3)
    # w2c translation (0,0,2) → center (0,0,-2)
    np.testing.assert_allclose(cam.camera_center, [0, 0, -2], atol=1e-5)


def test_colmap_text_fallback(tmp_path):
    root = tmp_path / "colmap_txt"
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    (sparse / "cameras.txt").write_text(
        "# comment\n1 SIMPLE_PINHOLE 40 32 38.0 20.0 16.0\n")
    (sparse / "images.txt").write_text(
        "1 1 0 0 0 0 0 2 1 a.png\n\n")
    (sparse / "points3D.txt").write_text(
        "1 0.1 0.2 0.3 10 20 30 0.5\n")
    info = dr.load_scene(str(root))
    assert len(info.train_cameras) == 1
    assert info.points.shape == (1, 3)


def test_colmap_dtu_split(tmp_path):
    """A path containing 'DTU' uses the benchmark's fixed held-out view
    ids (reference dataset_readers.py:271-273) instead of llffhold."""
    import shutil
    import struct

    root = tmp_path / "DTU_scan63"
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    (root / "images").mkdir()
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 40, 32))
        f.write(struct.pack("<4d", 35.0, 36.0, 20.0, 16.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 6))
        for i in range(6):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0, 0, 0))
            f.write(struct.pack("<3d", 0.1 * i, 0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 0))
        f.write(struct.pack("<3d", 0.0, 0.2, 1.0))
        f.write(struct.pack("<3B", 100, 150, 200))
        f.write(struct.pack("<d", 0.5))
        f.write(struct.pack("<Q", 0))

    info = dr.load_scene(str(root))
    # of the fixed ids {2,12,17,30,34} only 2 exists among 6 views
    assert len(info.test_cameras) == 1
    assert info.test_cameras[0].image_name == "img_2"
    assert len(info.train_cameras) == 5
