"""relightable3dgaussian_tpu — TPU-native differentiable Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capability set of
Relightable 3D Gaussian + Shader-GS (see SURVEY.md): tile-binned EWA splat
rasterization with analytic-quality gradients, NeILF-style per-splat BRDF
shading, LBVH ray-traced visibility, programmable per-splat shader stages,
and multi-chip sharding via jax.sharding.Mesh.

Design principles (TPU-first):
  * static shapes everywhere — padded capacities + masks, never dynamic sizes
  * compositing as per-tile matmuls (MXU), weight math on the VPU
  * sort-based binning via XLA `lax.sort`, segment reductions instead of atomics
  * sharding via Mesh + shard_map, gradients via psum
"""

__version__ = "0.1.0"
