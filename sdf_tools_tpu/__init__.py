"""tpu-sdf: TPU-native differentiable signed-distance-field engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
UM-ARM-Lab/sdf_tools (reference mounted at /root/reference). See SURVEY.md.
"""

from .grid import GridMeta, SdfGrid, CollisionMap, TaggedCollisionMap, make_origin_transform

__version__ = "0.1.0"
