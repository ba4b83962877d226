# -*- coding: utf-8 -*-
"""
Example 01: x-ray Bragg reflection from a spherical crystal.

Point-like source -> spherical quartz crystal (gaussian rocking curve) ->
detector. Geometry and crystal constants follow the reference's
examples/example_01 (quartz 1,1,-2,0; Darwin width 48 urad sigma).
"""

import numpy as np

import xicsrt_tpu

config = {
    "general": {
        "number_of_iter": 5,
        "random_seed": 0,
    },
    "sources": {
        "source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 1e4,
            "wavelength": 3.9492,
            "spread": np.radians(10.0),
        }
    },
    "optics": {
        "crystal": {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2,
            "ysize": 0.2,
            "radius": 1.0,
            # Nominal 'd' spacing (not 2d), in Angstroms.
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian",
            "rocking_fwhm": 48.070e-6,
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

results = xicsrt_tpu.raytrace(config)
