from .mesh import make_mesh, default_mesh_shape
from .spatial import sharded_pframe_step
from .gop import encode_gops_sharded

__all__ = [
    "make_mesh",
    "default_mesh_shape",
    "sharded_pframe_step",
    "encode_gops_sharded",
]
