from .mesh import make_mesh, param_spec, replicate, shard_batch, shard_params

__all__ = ["make_mesh", "param_spec", "replicate", "shard_batch",
           "shard_params"]
