from .mesh import make_decode_mesh, sharded_decode_step

__all__ = ["make_decode_mesh", "sharded_decode_step"]
