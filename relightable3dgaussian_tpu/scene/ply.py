"""Self-contained binary PLY I/O for Gaussian checkpoints and point clouds.

The reference uses the `plyfile` package (`scene/gaussian_model.py:630-793`,
`scene/dataset_readers.py:117-140`); that package is not available here, so
this is a minimal numpy implementation of the same subset:
binary_little_endian 1.0, one 'vertex' element, float/uchar scalar
properties.  The attribute schema written by `save_gaussian_ply` matches
the reference exactly (`construct_list_of_attributes`,
`gaussian_model.py:630-656`) so models interop in both directions.
"""
from __future__ import annotations

import io
import os

import numpy as np

_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}
_INV_DTYPES = {"<f4": "float", "<f8": "double", "u1": "uchar",
               "i1": "char", "<i2": "short", "<u2": "ushort",
               "<i4": "int", "<u4": "uint"}


def read_ply(path: str) -> dict[str, np.ndarray]:
    """Read a PLY file's 'vertex' element into {property: [N] array}.

    Supports ascii and binary_little_endian scalar properties (the only
    formats the reference reads/writes).
    """
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii").splitlines()
    body = data[header_end:]

    fmt = None
    elements: list[tuple[str, int, list[tuple[str, str]]]] = []
    cur = None
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            cur = (parts[1], int(parts[2]), [])
            elements.append(cur)
        elif parts[0] == "property" and cur is not None:
            if parts[1] == "list":
                raise ValueError("list properties not supported")
            cur[2].append((parts[-1], _DTYPES[parts[1]]))

    out: dict[str, np.ndarray] = {}
    offset = 0
    for name, count, props in elements:
        dt = np.dtype([(p, t) for p, t in props])
        if fmt == "binary_little_endian":
            arr = np.frombuffer(body, dtype=dt, count=count, offset=offset)
            offset += dt.itemsize * count
        elif fmt == "ascii":
            text = body.decode("ascii").splitlines()
            rows = [tuple(t.split()) for t in text[:count]]
            arr = np.array(rows, dtype=dt)
        else:
            raise ValueError(f"unsupported ply format {fmt}")
        if name == "vertex":
            for p, _ in props:
                out[p] = np.ascontiguousarray(arr[p])
    return out


def write_ply(path: str, props: dict[str, np.ndarray]) -> None:
    """Write {property: [N] array} as a binary_little_endian 'vertex' PLY."""
    names = list(props)
    n = len(props[names[0]])
    dt = np.dtype([(k, np.asarray(props[k]).dtype.newbyteorder("<"))
                   for k in names])
    rec = np.empty(n, dtype=dt)
    for k in names:
        rec[k] = np.asarray(props[k])

    buf = io.BytesIO()
    buf.write(b"ply\nformat binary_little_endian 1.0\n")
    buf.write(f"element vertex {n}\n".encode())
    for k in names:
        tname = _INV_DTYPES[
            rec.dtype[k].str.replace("=", "<").replace("|", "")]
        buf.write(f"property {tname} {k}\n".encode())
    buf.write(b"end_header\n")
    buf.write(rec.tobytes())
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def read_points_ply(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read an initialization point cloud → (points, colors01, normals).

    Mirrors reference `fetchPly` (`dataset_readers.py:117-126`).
    """
    v = read_ply(path)
    pts = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    if "red" in v:
        colors = np.stack([v["red"], v["green"], v["blue"]], -1
                          ).astype(np.float32) / 255.0
    else:
        colors = np.full_like(pts, 0.5)
    if "nx" in v:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], -1).astype(np.float32)
    else:
        normals = np.zeros_like(pts)
    return pts, colors, normals


def write_points_ply(path: str, points: np.ndarray, colors01: np.ndarray,
                     normals: np.ndarray | None = None) -> None:
    """Write an init point cloud (reference `storePly`,
    `dataset_readers.py:129-145`)."""
    if normals is None:
        normals = np.zeros_like(points)
    rgb = np.clip(colors01 * 255.0, 0, 255).astype(np.uint8)
    write_ply(path, {
        "x": points[:, 0].astype(np.float32),
        "y": points[:, 1].astype(np.float32),
        "z": points[:, 2].astype(np.float32),
        "nx": normals[:, 0].astype(np.float32),
        "ny": normals[:, 1].astype(np.float32),
        "nz": normals[:, 2].astype(np.float32),
        "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
    })


# ---------------------------------------------------------------------------
# Gaussian checkpoint schema (reference-compatible)
# ---------------------------------------------------------------------------

def save_gaussian_ply(path: str, arrays: dict[str, np.ndarray],
                      use_pbr: bool = False) -> None:
    """Save raw (pre-activation) splat params with the reference schema.

    Args:
      arrays: xyz [P,3], normal [P,3], shs_dc [P,1,3], shs_rest [P,K-1,3],
        opacity [P,1], scaling [P,3], rotation [P,4]; PBR adds base_color
        [P,3], roughness [P,1], metallic [P,1], incidents_dc/rest,
        visibility_dc/rest.

    SH blocks are flattened channel-major (`transpose(1, 2).flatten`,
    `gaussian_model.py:664-666`) for parity with reference files.
    """
    def chanmajor(x):  # [P, K, C] -> [P, C*K]
        return np.ascontiguousarray(
            np.swapaxes(x, 1, 2)).reshape(x.shape[0], -1)

    props: dict[str, np.ndarray] = {}

    def add(prefix, mat):
        mat = np.asarray(mat, np.float32)
        if mat.ndim == 1:
            mat = mat[:, None]
        if mat.shape[1] == 1 and prefix in ("opacity", "roughness",
                                            "metallic"):
            props[prefix] = mat[:, 0]
        else:
            for i in range(mat.shape[1]):
                props[f"{prefix}_{i}"] = mat[:, i]

    xyz = np.asarray(arrays["xyz"], np.float32)
    props["x"], props["y"], props["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    nrm = np.asarray(arrays["normal"], np.float32)
    props["nx"], props["ny"], props["nz"] = nrm[:, 0], nrm[:, 1], nrm[:, 2]
    add("f_dc", chanmajor(arrays["shs_dc"]))
    add("f_rest", chanmajor(arrays["shs_rest"]))
    add("opacity", arrays["opacity"])
    add("scale", arrays["scaling"])
    add("rot", arrays["rotation"])
    if use_pbr:
        add("base_color", arrays["base_color"])
        add("roughness", arrays["roughness"])
        add("metallic", arrays["metallic"])
        add("incidents_dc", chanmajor(arrays["incidents_dc"]))
        add("incidents_rest", chanmajor(arrays["incidents_rest"]))
        add("visibility_dc", chanmajor(arrays["visibility_dc"]))
        add("visibility_rest", chanmajor(arrays["visibility_rest"]))
    write_ply(path, props)


def _gather(v: dict[str, np.ndarray], prefix: str) -> np.ndarray:
    keys = sorted((k for k in v if k.startswith(prefix + "_")),
                  key=lambda k: int(k.rsplit("_", 1)[1]))
    return np.stack([v[k] for k in keys], axis=1).astype(np.float32)


def load_gaussian_ply(path: str) -> dict[str, np.ndarray]:
    """Load a reference-schema Gaussian PLY into raw param arrays.

    Inverse of `save_gaussian_ply`; mirrors `load_ply`
    (`gaussian_model.py:693-793`) including the channel-major SH unflatten.
    """
    v = read_ply(path)
    P = len(v["x"])
    out: dict[str, np.ndarray] = {}
    out["xyz"] = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    out["normal"] = np.stack([v["nx"], v["ny"], v["nz"]], -1
                             ).astype(np.float32)

    def unchan(mat, C=3):  # [P, C*K] -> [P, K, C]
        K = mat.shape[1] // C
        return np.ascontiguousarray(
            np.swapaxes(mat.reshape(P, C, K), 1, 2))

    out["shs_dc"] = unchan(_gather(v, "f_dc"))
    f_rest = _gather(v, "f_rest") if any(
        k.startswith("f_rest_") for k in v) else np.zeros((P, 0))
    out["shs_rest"] = unchan(f_rest) if f_rest.shape[1] else \
        np.zeros((P, 0, 3), np.float32)
    out["opacity"] = np.asarray(v["opacity"], np.float32)[:, None]
    out["scaling"] = _gather(v, "scale")
    out["rotation"] = _gather(v, "rot")
    if "roughness" in v:
        out["base_color"] = _gather(v, "base_color")
        out["roughness"] = np.asarray(v["roughness"], np.float32)[:, None]
        out["metallic"] = np.asarray(v["metallic"], np.float32)[:, None]
        out["incidents_dc"] = unchan(_gather(v, "incidents_dc"))
        out["incidents_rest"] = unchan(_gather(v, "incidents_rest"))
        out["visibility_dc"] = unchan(_gather(v, "visibility_dc"), C=1)
        out["visibility_rest"] = unchan(_gather(v, "visibility_rest"), C=1)
    return out
