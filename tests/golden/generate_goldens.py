"""Generate golden parity data by RUNNING the CPU reference implementation.

Runs PrincetonUniversity/xicsrt v0.8.13 (read-only at /root/reference) on
several spectrometer geometries and stores detector images + per-element ray
counts as .npz files under tests/golden/. The two codes use different RNGs,
so the parity tests compare distributions (Poisson/chi-square tolerances),
not bitwise images.

Usage:  python tests/golden/generate_goldens.py [scenario ...]
Scenarios: torus, mesh_sphere, mosaic (default: all missing ones).

This script only *executes* the reference as a black box; no reference code
is copied into this repository.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

HERE = os.path.dirname(os.path.abspath(__file__))

BASE = {
    "general": {
        "number_of_iter": 5,
        "number_of_runs": 2,
        "random_seed": 7,
        "save_images": False,
        "save_results": False,
        "save_config": False,
        "print_results": False,
    },
    "sources": {
        "source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 1e5,
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
            "rocking_fwhm": 48.070e-6,
        },
        "detector": {
            "class_name": "XicsrtOpticDetector",
            "origin": [0.0, 0.76871290, 0.56904832],
            "zaxis": [0.0, -0.95641806, 0.29200084],
            "xsize": 0.4,
            "ysize": 0.2,
            "pixel_size": 0.004,
        },
    },
}


def _with_crystal(_drop=(), **crystal_overrides):
    import copy

    config = copy.deepcopy(BASE)
    for key in _drop:
        config["optics"]["crystal"].pop(key, None)
    config["optics"]["crystal"].update(crystal_overrides)
    return config


SCENARIOS = {
    # Exercises the quartic torus solver (reference _ShapeTorus.py:110-183).
    "torus": _with_crystal(
        _drop=("radius",),
        class_name="XicsrtOpticToroidalCrystal",
        radius_major=1.0,
        radius_minor=0.2,
    ),
    # Exercises Möller–Trumbore + KD-tree refinement (_ShapeMesh.py:289-426).
    "mesh_sphere": _with_crystal(
        class_name="XicsrtOpticMeshSphericalCrystal",
        mesh_size=(21, 21),
        mesh_coarse_size=(7, 7),
    ),
    # Exercises the mosaic multi-layer loop (_InteractMosaicCrystal.py:53-107).
    "mosaic": _with_crystal(
        class_name="XicsrtOpticSphericalMosaicCrystal",
        mosaic_spread=np.radians(0.05),
        mosaic_depth=15,
        rocking_fwhm=150e-6,
    ),
}


def run_reference(name, config):
    import xicsrt

    result = xicsrt.raytrace(config)
    meta = result["total"]["meta"]
    image = result["total"]["image"]["detector"]
    out = {
        "image": np.asarray(image),
        "n_generated": np.asarray(meta["source"]["num_out"]),
        "meta_crystal": np.asarray(meta["crystal"]["num_out"]),
        "meta_detector": np.asarray(meta["detector"]["num_out"]),
    }
    path = os.path.join(HERE, f"{name}_reference_image.npz")
    np.savez_compressed(path, **out)
    print(
        f"{name}: generated={out['n_generated']} crystal={out['meta_crystal']} "
        f"detector={out['meta_detector']} -> {path}"
    )


def main():
    requested = sys.argv[1:] or [
        n
        for n in SCENARIOS
        if not os.path.exists(os.path.join(HERE, f"{n}_reference_image.npz"))
    ]
    for name in requested:
        run_reference(name, SCENARIOS[name])


if __name__ == "__main__":
    main()
