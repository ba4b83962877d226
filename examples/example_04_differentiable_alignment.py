# -*- coding: utf-8 -*-
"""
Example 04: differentiable instrument alignment.

Renders a target detector image with the true crystal d-spacing, perturbs
the crystal, then recovers the truth by gradient descent on the pixel-space
L2 loss — gradients flow from detector pixels through the Bragg reflection
probability and the ray geometry back to the crystal parameters.
"""

import copy

import numpy as np

import jax

from xicsrt_tpu.gradients import align, make_differentiable

config = {
    "general": {
        "number_of_iter": 1,
        "random_seed": 0,
        "print_results": False,
        "dtype": "float64",
    },
    "sources": {
        "source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 50000,
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
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian",
            "rocking_fwhm": 2e-4,
        },
        "detector": {
            "class_name": "XicsrtOpticDetector",
            "origin": [0.0, 0.76871290, 0.56904832],
            "zaxis": [0.0, -0.95641806, 0.29200084],
            "xsize": 0.4,
            "ysize": 0.2,
            "pixel_size": 0.01,
        },
    },
}

# 1. Render the target with the true instrument.
image_fn, pipeline = make_differentiable(config)
target = np.asarray(image_fn(pipeline.params, jax.random.key(7))["detector"])
print(f"target image: total weight {target.sum():.1f}")

# 2. Perturb the crystal d-spacing.
perturbed = copy.deepcopy(config)
perturbed["optics"]["crystal"]["crystal_spacing"] = 2.45676 * (1 + 2e-4)

# 3. Recover by gradient descent.
final, losses = align(
    perturbed,
    {"detector": target},
    optimize_paths=[("optics", "crystal", "crystal_spacing")],
    steps=60,
    learning_rate=2e-5,
    seed=7,
    resample=False,
)
print(f"loss: {losses[0]:.3e} -> {losses[-1]:.3e}")
print(f"d-spacing: recovered {float(final['optics']['crystal']['crystal_spacing']):.6f}"
      f" (true 2.456760, perturbed {2.45676 * (1 + 2e-4):.6f})")
