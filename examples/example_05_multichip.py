# -*- coding: utf-8 -*-
"""
Example 05: sharding rays over a device mesh.

One flag shards the ray batch across every local device; detector images
and counters psum-reduce over the interconnect. On a single-device machine
this example demonstrates the API with a virtual CPU mesh.
"""

import jax

# For the demo: build a virtual 8-device CPU mesh. On a real multi-chip
# machine or pod slice, delete these lines — the mesh then spans the real
# devices. (Both settings must run before any JAX operation.)
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass  # backend already initialized; use whatever devices exist

import numpy as np

import xicsrt_tpu

config = {
    "general": {
        "number_of_iter": 2,
        "random_seed": 0,
        "shard_rays": True,       # <- the only change vs a single-chip run
    },
    "sources": {
        "source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 80000,
            "wavelength": 3.9492,
            "spread": np.radians(5.0),
        }
    },
    "optics": {
        "detector": {
            "class_name": "XicsrtOpticDetector",
            "origin": [0.0, 0.0, 1.0],
            "zaxis": [0.0, 0.0, -1.0],
            "xsize": 0.2,
            "ysize": 0.2,
        }
    },
}

results = xicsrt_tpu.raytrace(config)
print(f"devices used: {len(jax.devices())}")
