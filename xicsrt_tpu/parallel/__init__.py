"""Multi-chip execution: ray-axis sharding over a device mesh."""

from xicsrt_tpu.parallel.mesh import make_sharded_run, ray_mesh  # noqa: F401
