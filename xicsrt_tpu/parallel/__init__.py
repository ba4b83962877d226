"""Multi-chip execution: ray-axis sharding over a device mesh."""

from xicsrt_tpu.parallel.mesh import (  # noqa: F401
    init_multihost,
    make_sharded_run,
    ray_mesh,
    scaling_efficiency,
)
