"""Multi-chip differentiable path: sharded gradients (round-3 verdict #1).

``make_differentiable(..., n_devices=8)`` wraps the weight-mode forward in
``shard_map`` with psum-reduced images; the transpose of that program is the
cross-device gradient all-reduce demanded by the north star. These tests
run on the 8-virtual-CPU-device mesh (conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xicsrt_tpu.gradients import make_differentiable


def _config(intensity, rocking_fwhm=2e-4):
    return {
        "general": {
            "number_of_iter": 1,
            "random_seed": 0,
            "print_results": False,
            "dtype": "float64",
        },
        "sources": {
            "source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": intensity,
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
                "rocking_fwhm": rocking_fwhm,
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


def _spacing_grad_fn(image_fn, pipeline):
    params = pipeline.params
    d0 = params["optics"]["crystal"]["crystal_spacing"]

    def loss(d, key):
        p = dict(params)
        p["optics"] = dict(params["optics"])
        p["optics"]["crystal"] = dict(params["optics"]["crystal"])
        p["optics"]["crystal"]["crystal_spacing"] = d
        return jnp.sum(image_fn(p, key)["detector"])

    return loss, d0


@pytest.fixture(scope="module")
def sharded():
    image_fn, pipeline = make_differentiable(_config(40000), n_devices=8)
    return image_fn, pipeline


def test_sharded_forward_preserves_totals(sharded):
    """8-device psum-reduced image integral equals the single-device photon
    budget semantics: same total ray count, comparable detected weight."""
    image_fn, pipeline = sharded
    img = image_fn(pipeline.params, jax.random.key(0))["detector"]
    total_sharded = float(jnp.sum(img))

    image_fn1, pipeline1 = make_differentiable(_config(40000))
    img1 = image_fn1(pipeline1.params, jax.random.key(0))["detector"]
    total_single = float(jnp.sum(img1))

    assert total_sharded > 0
    # Different RNG streams: agree within MC noise of the detected count.
    sigma = np.sqrt(max(total_single, 1.0))
    assert abs(total_sharded - total_single) < 8 * sigma, (
        total_sharded, total_single)


def test_sharded_grad_matches_own_finite_difference(sharded):
    """jax.grad through shard_map+psum equals the sharded estimator's own
    central difference (same keys -> identical estimator, exact parity)."""
    image_fn, pipeline = sharded
    loss, d0 = _spacing_grad_fn(image_fn, pipeline)
    key = jax.random.key(3)
    g = float(jax.grad(loss)(d0, key))
    eps = 1e-6
    fd = (float(loss(d0 + eps, key)) - float(loss(d0 - eps, key))) / (2 * eps)
    assert g != 0.0
    np.testing.assert_allclose(g, fd, rtol=2e-3)


def test_sharded_grad_matches_single_device(sharded):
    """8-device gradients agree with single-device gradients within MC
    tolerance (different RNG streams, same physics and total budget)."""
    image_fn8, pipeline8 = sharded
    loss8, d0 = _spacing_grad_fn(image_fn8, pipeline8)

    image_fn1, pipeline1 = make_differentiable(_config(40000))
    loss1, _ = _spacing_grad_fn(image_fn1, pipeline1)

    g8_fn = jax.jit(jax.grad(loss8))
    g1_fn = jax.jit(jax.grad(loss1))
    g8 = np.asarray([float(g8_fn(d0, jax.random.key(k))) for k in range(6)])
    g1 = np.asarray([float(g1_fn(d0, jax.random.key(k))) for k in range(6)])

    m8, s8 = g8.mean(), g8.std(ddof=1) / np.sqrt(len(g8))
    m1, s1 = g1.mean(), g1.std(ddof=1) / np.sqrt(len(g1))
    # Both estimates must be significant or the comparison is vacuous.
    assert abs(m8) > 10 * s8, (m8, s8)
    assert abs(m1) > 10 * s1, (m1, s1)
    assert abs(m8 - m1) < 5 * np.sqrt(s8**2 + s1**2), (
        f"sharded grad {m8:.6g} +- {s8:.2g} vs single {m1:.6g} +- {s1:.2g}"
    )


def test_sharded_pixel_gradients_flow(sharded):
    """Pixel-level gradient field w.r.t. optic pose survives the psum."""
    image_fn, pipeline = sharded
    nx_w = jax.random.normal(jax.random.key(9), (40, 20), jnp.float64)

    def loss(params, key):
        return jnp.sum(image_fn(params, key)["detector"] * nx_w)

    g = jax.grad(loss)(pipeline.params, jax.random.key(1))
    og = np.asarray(g["optics"]["crystal"]["frame"].origin)
    assert np.any(np.abs(og) > 0)
