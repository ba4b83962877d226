"""Unit tests for the L0 math layer: vectors, polynomials, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xicsrt_tpu.ops import polynomials as poly
from xicsrt_tpu.ops import physics, spread, vector, voigt


class TestVector:
    def test_normalize(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
        n = vector.normalize(v)
        np.testing.assert_allclose(vector.magnitude(n), [1.0, 1.0], atol=1e-12)

    def test_reflect(self):
        d = jnp.array([[1.0, 0.0, -1.0]]) / np.sqrt(2)
        n = jnp.array([[0.0, 0.0, 1.0]])
        r = vector.reflect(d, n)
        np.testing.assert_allclose(r, [[1.0, 0.0, 1.0]] / np.sqrt(2), atol=1e-12)

    def test_vector_rotate(self):
        a = jnp.array([1.0, 0.0, 0.0])
        axis = jnp.array([0.0, 0.0, 1.0])
        out = vector.vector_rotate(a, axis, jnp.pi / 2)
        np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-12)

    def test_rotation_matrix_matches_rodrigues(self):
        axis = vector.normalize(jnp.array([1.0, 2.0, -0.5]))
        theta = 0.7
        R = vector.rotation_matrix(axis, theta)
        v = jnp.array([0.3, -1.2, 2.0])
        np.testing.assert_allclose(
            R @ v, vector.vector_rotate(v, axis, theta), atol=1e-10
        )

    def test_toroidal_roundtrip(self):
        rng = np.random.default_rng(5)
        tor = np.stack(
            [
                rng.uniform(0.01, 0.5, 40),
                rng.uniform(-np.pi, np.pi, 40),
                rng.uniform(-np.pi, np.pi, 40),
            ],
            axis=-1,
        )
        car = vector.cartesian_from_toroidal(jnp.asarray(tor), 2.0)
        back = vector.toroidal_from_cartesian(car, 2.0)
        np.testing.assert_allclose(np.asarray(back), tor, atol=1e-12)

    def test_sinusoidal_spiral(self):
        # b=2 gives a circle through the pole: r = r0*sin(theta0+phi)/sin(theta0).
        phi = np.linspace(0.0, 0.5, 7)
        r = vector.sinusoidal_spiral(jnp.asarray(phi), 2.0, 1.5, 0.7)
        expected = 1.5 * np.sin(0.7 + phi) / np.sin(0.7)
        np.testing.assert_allclose(np.asarray(r), expected, atol=1e-12)

    def test_point_in_triangle(self):
        a = jnp.array([0.0, 0.0])
        b = jnp.array([1.0, 0.0])
        c = jnp.array([0.0, 1.0])
        p = jnp.array([[0.2, 0.2], [0.9, 0.9], [0.49, 0.49]])
        got = vector.point_in_triangle_2d(p, a, b, c)
        np.testing.assert_array_equal(got, [True, False, True])


class TestPolynomials:
    def test_quadratic_roots(self):
        a = jnp.array([1.0, 2.0, 1.0])
        b = jnp.array([-3.0, 0.0, 2.0])
        c = jnp.array([2.0, -8.0, 5.0])
        x0, x1, valid = poly.solve_quadratic(a, b, c)
        np.testing.assert_allclose(x0[:2], [1.0, -2.0], atol=1e-12)
        np.testing.assert_allclose(x1[:2], [2.0, 2.0], atol=1e-12)
        assert not bool(valid[2])

    def test_quadratic_cancellation(self):
        # Classic catastrophic-cancellation case: tiny root next to huge one.
        x0, x1, _ = poly.solve_quadratic(
            jnp.array([1.0]), jnp.array([-1e8]), jnp.array([1.0])
        )
        np.testing.assert_allclose(x0, [1e-8], rtol=1e-10)
        np.testing.assert_allclose(x1, [1e8], rtol=1e-10)

    def test_cubic_largest_real_root(self):
        # (x-1)(x-2)(x-3): largest root 3.
        r = poly.cubic_largest_real_root(
            jnp.array([-6.0]), jnp.array([11.0]), jnp.array([-6.0])
        )
        np.testing.assert_allclose(r, [3.0], atol=1e-10)
        # One real root: x^3 - 1 = 0 factored with complex pair.
        r = poly.cubic_largest_real_root(
            jnp.array([0.0]), jnp.array([0.0]), jnp.array([-1.0])
        )
        np.testing.assert_allclose(r, [1.0], atol=1e-10)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_quartic_random_roots(self, seed):
        rng = np.random.default_rng(seed)
        true = np.sort(rng.uniform(-3, 3, size=(64, 4)), axis=1)
        # Build coefficients from known real roots.
        c1 = -true.sum(axis=1)
        c2 = np.zeros(64)
        c3 = np.zeros(64)
        c4 = np.zeros(64)
        for i in range(64):
            p = np.poly(true[i])
            c1[i], c2[i], c3[i], c4[i] = p[1], p[2], p[3], p[4]
        roots = poly.solve_quartic(
            jnp.ones(64), jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(c3), jnp.asarray(c4)
        )
        np.testing.assert_allclose(np.asarray(roots), true, atol=1e-6)

    def test_quartic_complex_pairs(self):
        # (x^2+1)(x-1)(x-2) -> two real roots, one complex pair.
        p = np.polymul(np.array([1.0, 0.0, 1.0]), np.poly([1.0, 2.0]))
        roots = poly.solve_quartic(
            jnp.array([p[0]]),
            jnp.array([p[1]]),
            jnp.array([p[2]]),
            jnp.array([p[3]]),
            jnp.array([p[4]]),
        )
        r = np.asarray(roots)[0]
        np.testing.assert_allclose(r[:2], [1.0, 2.0], atol=1e-8)
        assert np.isnan(r[2]) and np.isnan(r[3])

    def test_quartic_biquadratic(self):
        # x^4 - 5x^2 + 4 = (x^2-1)(x^2-4).
        roots = poly.solve_quartic(
            jnp.array([1.0]),
            jnp.array([0.0]),
            jnp.array([-5.0]),
            jnp.array([0.0]),
            jnp.array([4.0]),
        )
        np.testing.assert_allclose(np.asarray(roots)[0], [-2, -1, 1, 2], atol=1e-8)

    def test_quartic_f32_accuracy(self):
        # Torus-like magnitudes in float32 must stay sub-micron after polish.
        true = np.array([[0.9, 1.1, 2.9, 3.1]])
        p = np.poly(true[0])
        roots = poly.solve_quartic(
            jnp.asarray([p[0]], dtype=jnp.float32),
            jnp.asarray([p[1]], dtype=jnp.float32),
            jnp.asarray([p[2]], dtype=jnp.float32),
            jnp.asarray([p[3]], dtype=jnp.float32),
            jnp.asarray([p[4]], dtype=jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(roots)[0], true[0], atol=5e-5)


class TestSpread:
    def test_isotropic_within_cone(self):
        key = jax.random.key(0)
        theta = 0.3
        v = spread.sample_isotropic(key, 20000, theta, dtype=jnp.float64)
        np.testing.assert_allclose(vector.magnitude(v), 1.0, atol=1e-12)
        assert float(jnp.min(v[:, 2])) >= np.cos(theta) - 1e-12

    def test_isotropic_uniform_in_cos(self):
        # z should be uniform on [cos(theta), 1].
        key = jax.random.key(1)
        theta = 0.5
        v = spread.sample_isotropic(key, 100000, theta, dtype=jnp.float64)
        z = np.asarray(v[:, 2])
        u = (z - np.cos(theta)) / (1 - np.cos(theta))
        # Kolmogorov-Smirnov-ish check against uniform.
        from scipy.stats import kstest

        assert kstest(u, "uniform").pvalue > 1e-4

    def test_isotropic_xy_region(self):
        key = jax.random.key(2)
        sp = [0.05, 0.3]  # asymmetric x/y half-angles
        v = spread.sample_isotropic_xy(key, 50000, sp, dtype=jnp.float64)
        v = np.asarray(v)
        sin_ax = v[:, 0] / np.sqrt(v[:, 0] ** 2 + v[:, 2] ** 2)
        sin_ay = v[:, 1] / np.sqrt(v[:, 1] ** 2 + v[:, 2] ** 2)
        assert np.all(np.abs(sin_ax) <= np.sin(0.05) + 1e-9)
        assert np.all(np.abs(sin_ay) <= np.sin(0.3) + 1e-9)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)

    def test_isotropic_xy_matches_rejection(self):
        """Statistical cross-check of the analytic sampler against brute-force
        rejection from the uniform sphere (the reference's approach)."""
        sp = [-0.1, 0.2, -0.15, 0.25]
        rng = np.random.default_rng(0)
        # Rejection-sample the same region from a circular isotropic cap.
        n_ref = 200000
        z = rng.uniform(np.cos(0.5), 1, n_ref)
        phi = rng.uniform(0, 2 * np.pi, n_ref)
        rho = np.sqrt(1 - z**2)
        v = np.stack([rho * np.cos(phi), rho * np.sin(phi), z], axis=-1)
        sx = v[:, 0] / np.sqrt(v[:, 0] ** 2 + v[:, 2] ** 2)
        sy = v[:, 1] / np.sqrt(v[:, 1] ** 2 + v[:, 2] ** 2)
        keep = (
            (sx > np.sin(sp[0]))
            & (sx <= np.sin(sp[1]))
            & (sy > np.sin(sp[2]))
            & (sy <= np.sin(sp[3]))
        )
        ref = v[keep]
        ours = np.asarray(
            spread.sample_isotropic_xy(jax.random.key(3), 100000, sp, dtype=jnp.float64)
        )
        from scipy.stats import ks_2samp

        sx_ours = ours[:, 0] / np.sqrt(ours[:, 0] ** 2 + ours[:, 2] ** 2)
        sx_ref = ref[:, 0] / np.sqrt(ref[:, 0] ** 2 + ref[:, 2] ** 2)
        assert ks_2samp(sx_ours, sx_ref).pvalue > 1e-4
        sy_ours = ours[:, 1] / np.sqrt(ours[:, 1] ** 2 + ours[:, 2] ** 2)
        sy_ref = ref[:, 1] / np.sqrt(ref[:, 1] ** 2 + ref[:, 2] ** 2)
        assert ks_2samp(sy_ours, sy_ref).pvalue > 1e-4

    def test_solid_angles(self):
        assert spread.solid_angle(np.pi, "isotropic") == pytest.approx(4 * np.pi)
        # Small rectangular window ~ product of widths.
        sa = spread.solid_angle([0.01, 0.02], "isotropic_xy")
        assert sa == pytest.approx(4 * 0.01 * 0.02, rel=1e-3)

    def test_flat_cone_edge(self):
        v = spread.sample_flat(jax.random.key(4), 20000, 0.4, dtype=jnp.float64)
        ang = np.arccos(np.asarray(v[:, 2]))
        assert ang.max() <= 0.4 + 1e-9

    def test_flat_xy_window(self):
        v = spread.sample_flat_xy(
            jax.random.key(5), 20000, [0.1, 0.2], dtype=jnp.float64
        )
        v = np.asarray(v)
        tx = v[:, 0] / v[:, 2]
        ty = v[:, 1] / v[:, 2]
        assert np.all(np.abs(tx) <= np.tan(0.1) + 1e-9)
        assert np.all(np.abs(ty) <= np.tan(0.2) + 1e-9)

    def test_flat_gaussian_hwhm(self):
        hwhm = 0.05
        v = spread.sample_flat_gaussian(
            jax.random.key(6), 200000, hwhm, dtype=jnp.float64
        )
        ang = np.arccos(np.clip(np.asarray(v[:, 2]), -1, 1))
        # Median angular deviation approximates the HWHM for small angles.
        sigma = hwhm / np.sqrt(2 * np.log(2))
        med = np.median(ang)
        expected_med = sigma * np.sqrt(2 * np.log(2))  # |2d gaussian| median ~ sigma*1.177
        np.testing.assert_allclose(med, expected_med, rtol=0.05)


class TestVoigt:
    def test_cdf_table_normalization(self):
        x, cdf = voigt.voigt_cdf_table(1e-4, 2e-4)
        assert cdf[-1] > 0.99
        assert np.all(np.diff(cdf) >= 0)

    def test_gaussian_limit(self):
        sigma = 3e-4
        x, cdf = voigt.voigt_cdf_table(0.0, sigma)
        samples = np.asarray(
            voigt.sample_voigt_tabulated(jax.random.key(7), 200000, x, cdf, dtype=jnp.float64)
        )
        np.testing.assert_allclose(samples.std(), sigma, rtol=0.02)
        np.testing.assert_allclose(samples.mean(), 0.0, atol=5 * sigma / np.sqrt(2e5))

    def test_lorentzian_limit(self):
        gamma = 1e-4
        x, cdf = voigt.voigt_cdf_table(gamma, 0.0)
        samples = np.asarray(
            voigt.sample_voigt_tabulated(jax.random.key(8), 200000, x, cdf, dtype=jnp.float64)
        )
        # Half of Lorentzian samples fall within +-gamma.
        frac = np.mean(np.abs(samples) < gamma)
        np.testing.assert_allclose(frac, 0.5, atol=0.02)

    def test_doppler_sigma(self):
        # 1 keV iron line at 1.85 A: sigma ~ lambda * sqrt(T/(m c^2)).
        s = voigt.doppler_sigma(1000.0, 56.0, 1.85)
        assert 1e-5 < s < 1e-3


class TestPhysics:
    def test_energy_wavelength_roundtrip(self):
        e = 3000.0
        np.testing.assert_allclose(
            float(physics.energy_from_wavelength(physics.wavelength_from_energy(e))),
            e,
            rtol=1e-12,
        )
        # hc ~ 12398.42 eV*A.
        np.testing.assert_allclose(
            float(physics.wavelength_from_energy(1.0)), 12398.42, atol=0.01
        )

    def test_bragg_angle(self):
        # lambda = 2d sin(theta): lambda=2, d=2 -> 30 degrees.
        th = float(physics.bragg_angle(2.0, 2.0))
        np.testing.assert_allclose(th, np.pi / 6, atol=1e-12)
