"""Multi-chip/multi-host parallelism: device meshes and sharded training.

The reference has no distributed code at all (SURVEY.md §2.7); this layer
is the TPU-native design: `jax.sharding.Mesh` axes for cameras (data
parallel) and tiles (the renderer's sequence-parallel analogue), XLA
collectives inserted by pjit from sharding annotations.
"""

from .mesh import make_mesh  # noqa: F401
