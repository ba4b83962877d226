"""Statistical distribution tests for the angular samplers (KS tests
against analytic CDFs) and engine output-control flags."""

import numpy as np
import pytest
from scipy.stats import kstest

import jax
import jax.numpy as jnp

from xicsrt_tpu.ops import spread


class TestFlatSamplers:
    def test_flat_radial_density(self):
        """'flat' = uniform areal density on the z=1 plane within tan(theta):
        CDF(r) = (r/tan(theta))^2."""
        theta = 0.4
        v = spread.sample_flat(jax.random.key(0), 100000, theta, dtype=jnp.float64)
        v = np.asarray(v)
        r = np.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2) / v[:, 2]  # tan(angle)
        u = (r / np.tan(theta)) ** 2
        assert kstest(u, "uniform").pvalue > 1e-4

    def test_flat_xy_uniform_in_tangent(self):
        t = [0.15, 0.25]
        v = spread.sample_flat_xy(jax.random.key(1), 100000, t, dtype=jnp.float64)
        v = np.asarray(v)
        tx = v[:, 0] / v[:, 2]
        ty = v[:, 1] / v[:, 2]
        ux = (tx + np.tan(t[0])) / (2 * np.tan(t[0]))
        uy = (ty + np.tan(t[1])) / (2 * np.tan(t[1]))
        assert kstest(ux, "uniform").pvalue > 1e-4
        assert kstest(uy, "uniform").pvalue > 1e-4
        # Independence: correlation ~ 0.
        assert abs(np.corrcoef(ux, uy)[0, 1]) < 0.02

    def test_isotropic_azimuthal_uniformity(self):
        v = spread.sample_isotropic(jax.random.key(2), 100000, 0.7, dtype=jnp.float64)
        v = np.asarray(v)
        phi = np.arctan2(v[:, 1], v[:, 0])
        assert kstest((phi + np.pi) / (2 * np.pi), "uniform").pvalue > 1e-4

    def test_isotropic_xy_solid_angle_consistency(self):
        """Acceptance of the analytic sampler's region equals the
        solid-angle formula: P(region | cap) = Omega_region / Omega_cap."""
        sp = [0.12, 0.2]
        cap = 0.4
        n = 400000
        v = spread.sample_isotropic(jax.random.key(3), n, cap, dtype=jnp.float64)
        v = np.asarray(v)
        sx = v[:, 0] / np.sqrt(v[:, 0] ** 2 + v[:, 2] ** 2)
        sy = v[:, 1] / np.sqrt(v[:, 1] ** 2 + v[:, 2] ** 2)
        inside = (
            (np.abs(sx) <= np.sin(sp[0])) & (np.abs(sy) <= np.sin(sp[1]))
        )
        frac = inside.mean()
        expected = spread.solid_angle(sp, "isotropic_xy") / spread.solid_angle(
            cap, "isotropic"
        )
        sigma = np.sqrt(expected * (1 - expected) / n)
        assert abs(frac - expected) < 5 * sigma


class TestOutputFlags:
    def _config(self, **general):
        g = {"number_of_iter": 1, "random_seed": 0, "print_results": False}
        g.update(general)
        return {
            "general": g,
            "sources": {
                "source": {
                    "class_name": "XicsrtSourceDirected",
                    "intensity": 1000,
                    "wavelength": 1.0,
                    "spread": 0.1,
                }
            },
            "optics": {
                "detector": {
                    "class_name": "XicsrtOpticDetector",
                    "origin": [0.0, 0.0, 1.0],
                    "zaxis": [0.0, 0.0, -1.0],
                    "xsize": 1.0,
                    "ysize": 1.0,
                }
            },
        }

    def test_keep_images_false(self):
        import xicsrt_tpu

        r = xicsrt_tpu.raytrace(self._config(keep_images=False))
        assert r["total"]["image"] == {}
        assert r["total"]["meta"]["detector"]["num_out"] == 1000

    def test_scenario_section_passthrough(self):
        import xicsrt_tpu

        config = self._config()
        config["scenario"] = {"campaign": "W7-X OP2", "shot": 20230216}
        r = xicsrt_tpu.raytrace(config)
        assert r["config"]["scenario"]["shot"] == 20230216

    def test_number_of_runs_seed_folding(self):
        """Each run draws different rays but the combined total is exact."""
        import xicsrt_tpu

        r = xicsrt_tpu.raytrace(self._config(number_of_runs=2))
        hist = r["found"]["history"]["source"]["origin"]
        assert hist.shape[0] == 2000
        # The two runs' direction sets differ.
        d = r["found"]["history"]["source"]["direction"]
        assert not np.allclose(d[:1000], d[1000:])
