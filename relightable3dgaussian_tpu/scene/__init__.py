"""Scene state: cameras, dataset readers, PLY I/O (reference `scene/`)."""

from .cameras import Camera, make_camera  # noqa: F401
from .dataset_readers import SceneInfo, load_scene  # noqa: F401
