# -*- coding: utf-8 -*-
"""
Example 02: boolean aperture composition.

A sequence of circular apertures combined with and/not/or logic carves a
complex transmission shape (the reference's examples/example_02 crescent).
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
            "angular_dist": "isotropic_xy",
            "spread": np.radians(6.0),
        }
    },
    "optics": {
        "aperture": {
            "class_name": "XicsrtOpticAperture",
            "origin": [0.0, 0.0, 0.8],
            "zaxis": [0.0, 0.0, -1.0],
            "aperture": [
                {"shape": "circle", "size": [0.075], "logic": "and"},
                {"shape": "circle", "size": [0.065], "origin": [-0.010, -0.01], "logic": "not"},
                {"shape": "circle", "size": [0.048], "origin": [-0.027, -0.01], "logic": "or"},
                {"shape": "circle", "size": [0.044], "origin": [-0.032, -0.015], "logic": "not"},
                {"shape": "circle", "size": [0.034], "origin": [-0.041, -0.013], "logic": "or"},
                {"shape": "circle", "size": [0.032], "origin": [-0.045, -0.018], "logic": "not"},
                {"shape": "circle", "size": [0.025], "origin": [-0.038, -0.020], "logic": "or"},
            ],
        },
        "detector": {
            "class_name": "XicsrtOpticDetector",
            "origin": [0.0, 0.0, 1.0],
            "zaxis": [0.0, 0.0, -1.0],
            "xsize": 0.2,
            "ysize": 0.2,
        },
    },
}

results = xicsrt_tpu.raytrace(config)
