# -*- coding: utf-8 -*-
"""
Example 07: in-kernel gradients (the fused differentiable path).

The same alignment task as example 04, but forward AND backward run as
Pallas megakernels (``ops/fused_grad.py``): a hand-derived adjoint sweep
accumulates parameter gradients on-chip at ~3.6e8 rays/s per optimization
step on one v5e chip — 1.7x the XLA differentiable path. Differentiated
parameters ride an SMEM vector, so the descent loop never recompiles.

Works on CPU too (Pallas interpreter; auto-selected off-TPU).
"""

import numpy as np

import jax
import jax.numpy as jnp

from xicsrt_tpu.gradients import make_fused_differentiable
from xicsrt_tpu.ops.fused_grad import SLOTS_PER_OPTIC, unpack_grads

config = {
    "general": {
        "number_of_iter": 1,
        "random_seed": 0,
        "print_results": False,
    },
    "sources": {
        "source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 1 << 16,
            "wavelength": 3.9492,
            "angular_dist": "isotropic_xy",
            "spread": np.radians(10.0),
        }
    },
    "optics": {
        # The hero geometry of the reference: a TOROIDAL Bragg crystal
        # (_XicsrtOpticToroidalCrystal.py:16, _ShapeTorus.py:136-183) —
        # since round 5 the fused gradient kernels solve the torus
        # in-kernel (implicit-function adjoint of the converged root).
        "crystal": {
            "class_name": "XicsrtOpticToroidalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2,
            "ysize": 0.2,
            "radius_major": 1.0,
            "radius_minor": 0.4,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian",
            "rocking_fwhm": 1e-3,
            "pixel_size": 0.01,
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


def main():
    forward, vjp, pack, pipeline = make_fused_differentiable(config)
    pvec_true = pack(pipeline.params)
    key = jax.random.key(7)

    # Target image at the true parameters.
    target = forward(pvec_true, key)["image"]

    # Perturb the crystal d-spacing and recover it by sign descent on the
    # L2 pixel loss (frozen rays -> deterministic loss).
    slot = SLOTS_PER_OPTIC * 0 + 13  # optic 0 = crystal
    d_true = float(pvec_true[slot])
    pvec = pvec_true.at[slot].set(d_true * (1 + 2e-4))
    print(f"true d-spacing      {d_true:.6f}")
    print(f"perturbed           {float(pvec[slot]):.6f}")

    step = 2.5e-4
    gvec0 = None
    for i in range(14):
        out = forward(pvec, key)
        # dL/d(image) for L = 0.5 * sum((image - target)^2):
        g = {k: out["image"][k] - target[k] for k in out["image"]}
        gvec = vjp(pvec, key, g)
        if gvec0 is None:
            gvec0 = gvec
        pvec = pvec.at[slot].add(-step * float(jnp.sign(gvec[slot])))
        step *= 0.6
        if i % 4 == 0:
            loss = sum(float(jnp.sum(v * v)) for v in g.values())
            print(f"step {i:2d}: loss {loss:10.4f}  "
                  f"d {float(pvec[slot]):.6f}")

    print(f"recovered           {float(pvec[slot]):.6f} "
          f"(error {abs(float(pvec[slot]) - d_true):.2e})")

    # The gradient vector maps back to a params-shaped pytree — for a
    # toroidal crystal both curvature radii receive signal (shown at the
    # perturbed starting point; the converged gradient is ~0):
    grads = unpack_grads(pipeline, gvec0)
    print("d(loss)/d(crystal origin)       =", grads["crystal"]["origin"])
    print("d(loss)/d(crystal radius_major) =",
          grads["crystal"]["radius"])
    print("d(loss)/d(crystal radius_minor) =",
          grads["crystal"]["radius_minor"])


if __name__ == "__main__":
    main()
