from .shard import make_mesh, replicate, shard_render  # noqa: F401
