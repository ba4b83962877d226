# -*- coding: utf-8 -*-
"""
Example 00: the simplest raytrace — a directed source and a detector.

The configuration dictionary is the whole user API. It can contain the
sections: general, sources, optics, filters, scenario. Entries overwrite
the built-in defaults; unknown keys raise errors (strict checking).

Equivalent of the reference's examples/example_00.
"""

import numpy as np

import xicsrt_tpu

xicsrt_tpu.warn_version("0.1")

config = {}

# number_of_iter repeats the trace and combines the output — the classic
# way to push total ray counts beyond single-batch memory.
config["general"] = {}
config["general"]["number_of_iter"] = 5
config["general"]["random_seed"] = 0

config["sources"] = {}
config["sources"]["source"] = {
    "class_name": "XicsrtSourceDirected",
    "intensity": 1e4,           # rays per iteration
    "wavelength": 3.9492,       # Angstroms
    "spread": np.radians(5.0),  # emission cone half-angle
}

config["optics"] = {}
config["optics"]["detector"] = {
    "class_name": "XicsrtOpticDetector",
    "origin": [0.0, 0.0, 1.0],
    "zaxis": [0.0, 0.0, -1.0],
    "xsize": 0.2,
    "ysize": 0.2,
}

results = xicsrt_tpu.raytrace(config)

image = results["total"]["image"]["detector"]
print(f"detector image: {image.shape}, total counts {image.sum():.0f}")

if __name__ == "__main__":
    try:
        import matplotlib

        matplotlib.use("Agg")
        from xicsrt_tpu.visual import plot2d

        plot2d.plot_image(results, "detector").savefig("example_00_image.png")
        print("wrote example_00_image.png")
    except ImportError:
        pass
