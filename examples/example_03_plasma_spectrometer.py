# -*- coding: utf-8 -*-
"""
Example 03: a full plasma x-ray spectrometer measurement in real units.

A toroidal plasma emits a Doppler-broadened line; a toroidal Bragg crystal
disperses it onto a detector. The absolute number of detected photons is
physically meaningful: emissivity [ph/m^3/s] x integration time x volume x
solid angle, with Poisson statistics at every step.
"""

import numpy as np

import xicsrt_tpu

config = {
    "general": {
        "number_of_iter": 4,
        "random_seed": 0,
    },
    "sources": {
        "plasma": {
            "class_name": "XicsrtPlasmaCubic",
            "origin": [0.0, 0.0, 0.0],
            "xsize": 0.02,
            "ysize": 0.02,
            "zsize": 0.02,
            "target": [0.0, 0.0, 0.80374151],
            "spread": np.radians(10.0),
            "emissivity": 1e16,        # ph / m^3 / s
            "temperature": 1000.0,     # eV -> Doppler width
            "mass_number": 40.0,       # argon
            "wavelength": 3.9492,
            "time_resolution": 1e-3,   # s
            "bundle_volume": 1e-6,
            "bundle_count": 4000,
            "use_poisson": True,
            "max_rays": int(5e6),
        }
    },
    "optics": {
        "crystal": {
            "class_name": "XicsrtOpticToroidalCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2,
            "ysize": 0.2,
            "radius_major": 1.0,
            "radius_minor": 0.64,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian",
            "rocking_fwhm": 100e-6,
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

w = results["found"]["history"]["plasma"]["wavelength"]
if len(w):
    print(f"detected line width (std): {w.std():.2e} A "
          f"(Doppler expectation ~{3.9492*np.sqrt(1000*1.602e-19/(40*1.661e-27*9e16)):.2e} A)")
