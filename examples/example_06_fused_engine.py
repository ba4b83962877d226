# -*- coding: utf-8 -*-
"""
Example 06: engine selection — the fused Pallas megakernel.

The same config runs on three engines (``general.engine``):

- ``"xla"`` — one fused XLA program; supports everything (history,
  gradients, f64).
- ``"fused"`` — one Pallas TPU kernel: hardware-PRNG sampling, the whole
  optic chain, and MXU image binning with per-ray state in VMEM only
  (~2.3e9 rays/s on one v5e chip vs ~6e8 for the XLA engine). Raises
  outside its supported subset.
- ``"auto"`` — fused when possible, XLA otherwise.

The two engines draw different random streams (hardware PRNG vs
threefry), so results agree statistically, not bitwise. This example runs
a mesh-optic spectrometer — on the fused engine the triangle mesh is
compiled into a Chebyshev height-field surrogate (docs/engines.md).
"""

import numpy as np

import xicsrt_tpu

config = {
    "general": {
        "number_of_iter": 2,
        "random_seed": 0,
        "keep_history": False,   # the fused engine keeps no ray history
        "engine": "auto",
    },
    "sources": {
        "source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 1e5,
            "wavelength": 3.9492,
            "angular_dist": "isotropic_xy",
            "spread": np.radians(10.0),
        }
    },
    "optics": {
        "crystal": {
            "class_name": "XicsrtOpticMeshSphericalCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2,
            "ysize": 0.2,
            "radius": 1.0,
            "mesh_size": (41, 41),
            "mesh_coarse_size": (11, 11),
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian",
            "rocking_fwhm": 150e-6,
        },
        "detector": {
            "class_name": "XicsrtOpticDetector",
            "origin": [0.0, 0.76871290, 0.56904832],
            "zaxis": [0.0, -0.95641806, 0.29200084],
            "xsize": 0.4,
            "ysize": 0.2,
        },
    },
}

for engine in ("xla", "auto"):
    config["general"]["engine"] = engine
    config["general"]["print_results"] = False
    results = xicsrt_tpu.raytrace(config)
    meta = results["total"]["meta"]
    print(
        f"engine={engine:5s}: generated {meta['source']['num_out']}, "
        f"detected {meta['detector']['num_out']}"
    )
