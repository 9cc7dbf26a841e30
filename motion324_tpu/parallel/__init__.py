"""Device-mesh and sharding utilities (GSPMD / shard_map)."""

from motion324_tpu.parallel.mesh import make_mesh, batch_sharding, replicate  # noqa: F401
