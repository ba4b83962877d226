"""Measure fused-gradient (fwd+bwd) throughput on the real TPU chip.

One optimization step = forward megakernel + adjoint megakernel
(ops/fused_grad.py) on the example-07 spectrometer, sphere or torus
crystal. Dispatches are serialized through a data dependency (bench.py
pattern — never time overlapping dispatches on this backend).

Usage: python tools/bench_fused_grad.py [sphere|torus] [chunk ...]
Feeds the measured rows in docs/performance.md.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from xicsrt_tpu.gradients import make_fused_differentiable


def _config(kind):
    config = {
        "general": {"number_of_iter": 1, "random_seed": 0,
                    "print_results": False},
        "sources": {"source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 1 << 22, "wavelength": 3.9492,
            "angular_dist": "isotropic_xy", "spread": np.radians(10.0)}},
        "optics": {
            "crystal": {
                "class_name": "XicsrtOpticSphericalCrystal",
                "origin": [0.0, -3e-4, 0.80374151],
                "zaxis": [0.0, 0.59497864, -0.80374151],
                "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
                "crystal_spacing": 2.45676, "rocking_type": "gaussian",
                "rocking_fwhm": 1e-3, "pixel_size": 0.01},
            "detector": {
                "class_name": "XicsrtOpticDetector",
                "origin": [0.0, 0.76871290, 0.56904832],
                "zaxis": [0.0, -0.95641806, 0.29200084],
                "xsize": 0.4, "ysize": 0.2, "pixel_size": 0.01}}}
    if kind == "torus":
        c = config["optics"]["crystal"]
        c["class_name"] = "XicsrtOpticToroidalCrystal"
        del c["radius"]
        c["radius_major"] = 1.0
        c["radius_minor"] = 0.4
    elif kind == "mosaic":
        c = config["optics"]["crystal"]
        c["class_name"] = "XicsrtOpticSphericalMosaicCrystal"
        c["mosaic_spread"] = np.radians(0.05)
        c["mosaic_depth"] = 15
    return config


def bench(kind, chunk, reps=5):
    fwd, vjp, pack, pipe = make_fused_differentiable(_config(kind),
                                                     chunk=chunk)
    pvec = pack(pipe.params)
    key = jax.random.key(0)
    gs = {o.name: jnp.ones(tuple(int(x) for x in o.image_shape),
                           jnp.float32)
          for o in pipe.optics if o.enable_image}

    @jax.jit
    def step(pv, key, dep):
        out = fwd(pv, jax.random.fold_in(key, dep))
        g = {k: gs[k] for k in out["image"]}
        gv = vjp(pv, jax.random.fold_in(key, dep), g)
        return gv, (jnp.sum(gv) != 0).astype(jnp.uint32)

    dep = jnp.uint32(0)
    for _ in range(3):
        gv, dep = step(pvec, key, dep)
    jax.block_until_ready(dep)
    t0 = time.perf_counter()
    for _ in range(reps):
        gv, dep = step(pvec, key, dep)
    jax.block_until_ready(dep)
    dt = time.perf_counter() - t0
    n = (1 << 22) * reps
    print(f"{kind} chunk={chunk}: {n / dt:.3e} rays/s fwd+bwd")


if __name__ == "__main__":
    kinds = ([sys.argv[1]] if len(sys.argv) > 1
             else ["sphere", "torus", "mosaic"])
    chunks = ([int(c) for c in sys.argv[2:]] if len(sys.argv) > 2
              else [8192, 32768, 131072])
    for kind in kinds:
        for chunk in chunks:
            bench(kind, chunk)
