"""Light models: learnable global SH env, HDR equirect env map, gamma.

TPU-native analogues of `scene/derect_light_sh.py` (DirectLightEnv),
`scene/envmap.py` (EnvLight — nvdiffrast texture lookup replaced by a
4-tap bilinear gather), and `scene/gamma_trans.py`
(LearningGammaTransform).  All are small pytrees + pure functions.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

PI = np.pi


@flax.struct.dataclass
class DirectLightParams:
    """Global incident light as one SH function (reference
    `derect_light_sh.py:6-33`; default degree 3 → 16 coeffs)."""
    env_shs_dc: jnp.ndarray    # [1, 1, 3]
    env_shs_rest: jnp.ndarray  # [1, K-1, 3]

    @property
    def env_shs(self) -> jnp.ndarray:
        return jnp.concatenate([self.env_shs_dc, self.env_shs_rest], axis=1)


def create_direct_light(sh_degree: int = 3) -> DirectLightParams:
    k = (sh_degree + 1) ** 2
    return DirectLightParams(
        env_shs_dc=jnp.zeros((1, 1, 3)),
        env_shs_rest=jnp.zeros((1, k - 1, 3)))


@flax.struct.dataclass
class GammaParams:
    """Single learnable gamma for HDR→LDR (`gamma_trans.py:6-51`)."""
    gamma: jnp.ndarray  # [1]


def create_gamma() -> GammaParams:
    return GammaParams(gamma=jnp.ones(1))


def apply_gamma(p: GammaParams, hdr: jnp.ndarray,
                use_ldr_image: bool = True) -> jnp.ndarray:
    if not use_ldr_image:
        return hdr
    return jnp.clip(hdr, 1e-9, 1.0) ** p.gamma


# ---------------------------------------------------------------------------
# HDR environment map (relighting)
# ---------------------------------------------------------------------------

# COLMAP-world → OpenGL env coords (reference `envmap.py:13`).
_TO_OPENGL = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)


@flax.struct.dataclass
class EnvMap:
    """Lat-long HDR environment image (reference `EnvLight`)."""
    image: jnp.ndarray                  # [H, W, 3] float32 (scaled)
    transform: jnp.ndarray | None = None  # optional [3, 3] light rotation


def load_envmap(path: str, scale: float = 1.0) -> EnvMap:
    """Load an .hdr/.exr lat-long map (cv2 when available, .hdr has a
    numpy fallback)."""
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        if path.endswith(".hdr"):
            img = _read_radiance_hdr(path)
        else:
            raise
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
    return EnvMap(image=jnp.asarray(img * scale))


def _read_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) reader (RLE-compressed scanlines)."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not a radiance file")
        while True:
            line = f.readline().strip()
            if not line:
                break
        dims = f.readline().split()
        if dims[0] != b"-Y":
            raise ValueError("unsupported orientation")
        H, W = int(dims[1]), int(dims[3])
        data = np.zeros((H, W, 4), np.uint8)
        for y in range(H):
            head = f.read(4)
            if head[0] == 2 and head[1] == 2 and (head[2] << 8 | head[3]) == W:
                for c in range(4):
                    x = 0
                    while x < W:
                        n = f.read(1)[0]
                        if n > 128:
                            data[y, x: x + n - 128, c] = f.read(1)[0]
                            x += n - 128
                        else:
                            buf = np.frombuffer(f.read(n), np.uint8)
                            data[y, x: x + n, c] = buf
                            x += n
            else:
                row = head + f.read(4 * W - 4)
                data[y] = np.frombuffer(row, np.uint8).reshape(W, 4)
    rgbe = data.astype(np.float32)
    exp = np.exp2(rgbe[..., 3] - 136.0)
    return rgbe[..., :3] * exp[..., None]


def direct_light(env: EnvMap, dirs: jnp.ndarray,
                 transform: jnp.ndarray | None = None) -> jnp.ndarray:
    """Bilinear equirect lookup of env radiance along world dirs.

    Matches the reference lookup (`envmap.py:31-48`): world → OpenGL
    axes, u from atan2(x, -z), v from acos(y); bilinear filtering (the
    nvdiffrast `dr.texture` call becomes a 4-tap gather).

    Args:
      dirs: [..., 3] unit directions.
    Returns:
      [..., 3] radiance.
    """
    shape = dirs.shape
    d = dirs.reshape(-1, 3)
    t = transform if transform is not None else env.transform
    if t is not None:
        d = d @ t.T
    v = d @ jnp.asarray(_TO_OPENGL).T
    tu = jnp.arctan2(v[:, 0], -v[:, 2]) / (2 * PI) + 0.5
    tv = jnp.arccos(jnp.clip(v[:, 1], -1.0, 1.0)) / PI

    H, W = env.image.shape[:2]
    # nvdiffrast 'linear' samples at texel centers; u wraps, v clamps.
    x = tu * W - 0.5
    y = tv * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    x1i = jnp.mod(x0i + 1, W)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    img = env.image
    c00 = img[y0i, x0i]
    c01 = img[y0i, x1i]
    c10 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    out = (c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
           + c10 * (1 - fx) * fy + c11 * fx * fy)
    return out.reshape(shape)
