# -*- coding: utf-8 -*-
"""
Example 08: fitting plasma parameters from a measured spectrum.

The scientific payoff of a differentiable XICS code: recover the plasma
EMISSIVITY (absolute brightness) and ION TEMPERATURE (Doppler line
width) from a detector image, with d(image)/d(emissivity, temperature)
computed IN-KERNEL by the fused gradient path (``ops/fused_grad.py``,
round 5). The reference computes these images forward-only
(``_XicsrtPlasmaGeneric.py:269-320`` real-units semantics); fitting
there means scanning or external finite differences.

Emissivity enters each ray's weight (exact linear-rate derivative) and
temperature the Doppler width by reparameterization, so both gradients
are exact per sample. Works on CPU too (Pallas interpreter).
"""

import numpy as np

import jax
import jax.numpy as jnp

from xicsrt_tpu.gradients import make_fused_differentiable
from xicsrt_tpu.ops.fused_grad import SLOTS_PER_OPTIC


def _config(emissivity, temperature):
    return {
        "general": {"number_of_iter": 1, "random_seed": 0,
                    "print_results": False},
        "sources": {"plasma": {
            "class_name": "XicsrtPlasmaCubic",
            "origin": [0.0, 0.0, 0.0],
            "xsize": 2e-4, "ysize": 2e-4, "zsize": 2e-4,
            "target": [0.0, -3e-4, 0.80374151],
            "spread": np.radians(4.0),
            "emissivity": emissivity,
            "temperature": temperature,
            "mass_number": 40.0,
            "wavelength": 3.9492,
            "time_resolution": 1e-3,
            "bundle_volume": 8e-12,
            "use_poisson": False,   # counted budget (fused-grad subset)
        }},
        "optics": {
            "crystal": {
                "class_name": "XicsrtOpticSphericalCrystal",
                "origin": [0.0, -3e-4, 0.80374151],
                "zaxis": [0.0, 0.59497864, -0.80374151],
                "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
                "crystal_spacing": 2.45676,
                "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
                "pixel_size": 0.02},
            "detector": {
                "class_name": "XicsrtOpticDetector",
                "origin": [0.0, 0.76871290, 0.56904832],
                "zaxis": [0.0, -0.95641806, 0.29200084],
                "xsize": 0.4, "ysize": 0.2, "pixel_size": 0.002},
        },
    }


def main():
    E_true, T_true = 8.3e20, 2.0e4  # [ph/m^3/s], [eV]
    forward, vjp, pack, pipeline = make_fused_differentiable(
        _config(E_true, T_true), chunk=8192)
    pvec_true = pack(pipeline.params)
    b = len(pipeline.optics) * SLOTS_PER_OPTIC  # source slot block
    key = jax.random.key(3)

    # "Measured" spectrum: the image at the true parameters.
    target = np.asarray(forward(pvec_true, key)["image"]["detector"])
    n_rays = pipeline.source.num_rays
    print(f"target spectrum: {n_rays} photons, "
          f"{target.sum():.0f} detected weight")

    # Start from a wrong guess: 40% dimmer, 50% colder.
    pvec = pvec_true.at[b + 0].multiply(0.6).at[b + 1].multiply(0.5)
    print(f"true      E {E_true:.3e}  T {T_true:.0f}")
    print(f"initial   E {float(pvec[b + 0]):.3e}  "
          f"T {float(pvec[b + 1]):.0f}")

    # Adam on (log E, log T) through the in-kernel vjp; frozen rays ->
    # deterministic loss (resample with fold_in(key, step) for SGD).
    m = np.zeros(2)
    v = np.zeros(2)
    lr, b1, b2 = 0.08, 0.9, 0.999
    for step in range(200):
        out = forward(pvec, key)
        g_img = {k: out["image"][k] - target if k == "detector"
                 else jnp.zeros_like(out["image"][k])
                 for k in out["image"]}
        gvec = np.asarray(vjp(pvec, key, g_img))
        theta = np.log(np.asarray(pvec[b:b + 2], dtype=np.float64))
        grad = gvec[b:b + 2] * np.exp(theta)  # d/d(log x) = x d/dx
        m = b1 * m + (1 - b1) * grad
        v = b2 * v + (1 - b2) * grad * grad
        mh = m / (1 - b1 ** (step + 1))
        vh = v / (1 - b2 ** (step + 1))
        theta = theta - lr * mh / (np.sqrt(vh) + 1e-12)
        pvec = pvec.at[b:b + 2].set(jnp.asarray(np.exp(theta),
                                                jnp.float32))
        if step % 25 == 0:
            loss = float(jnp.sum((out["image"]["detector"]
                                  - target) ** 2))
            print(f"step {step:2d}: loss {loss:9.3f}  "
                  f"E {float(pvec[b + 0]):.3e}  "
                  f"T {float(pvec[b + 1]):.0f}")

    E_fit = float(pvec[b + 0])
    T_fit = float(pvec[b + 1])
    print(f"recovered E {E_fit:.3e} ({abs(E_fit / E_true - 1) * 100:.1f}% "
          f"err)  T {T_fit:.0f} ({abs(T_fit / T_true - 1) * 100:.1f}% err)")
    assert abs(E_fit / E_true - 1) < 0.05
    assert abs(T_fit / T_true - 1) < 0.15


if __name__ == "__main__":
    main()
