from .sharding import make_mesh, shard_groups, analyze_groups_sharded  # noqa: F401
