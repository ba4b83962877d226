"""Fused single-kernel engine (ops/fused_trace.py) vs the XLA engine.

The fused kernel runs here under the Pallas TPU interpreter with injected
threefry uniforms (the hardware PRNG is a zero stub off-chip). The two
engines draw independent random streams, so all comparisons are
distributional: binomial tolerances on per-element counts and chi-square on
coarse-grained images.

Reference behaviors covered: full trace loop ``_TraceObject.py:157-291``,
crystal acceptance ``_InteractCrystal.py:90-196``, source sampling
``_XicsrtSourceGeneric.py:198-292``, aperture logic ``xicsrt_aperture.py``.
"""

import jax
import numpy as np
import pytest

from xicsrt_tpu.engine import Pipeline, raytrace
from xicsrt_tpu.ops.fused_trace import FusedUnsupported, build_fused_run


def _spectrometer(intensity, **general):
    g = {
        "number_of_iter": 1,
        "random_seed": 0,
        "keep_history": False,
        "print_results": False,
        "save_images": False,
    }
    g.update(general)
    return {
        "general": g,
        "sources": {
            "source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": intensity,
                "wavelength": 3.9492,
                "angular_dist": "isotropic_xy",
                "spread": np.radians(10.0),
            }
        },
        "optics": {
            "aperture": {
                "class_name": "XicsrtOpticAperture",
                "origin": [0.0, 0.0, 0.4],
                "zaxis": [0.0, 0.0, -1.0],
                "aperture": [
                    {"shape": "circle", "size": [0.09], "logic": "and"},
                    {"shape": "circle", "size": [0.03],
                     "origin": [-0.02, 0.0], "logic": "not"},
                ],
            },
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
            },
        },
    }


def _run_both(config, n_fused=None):
    pipe = Pipeline(config)
    fused = build_fused_run(pipe, chunk=8192, interpret=True)
    out_f = jax.tree_util.tree_map(
        np.asarray, fused(jax.random.key(1)))
    it = pipe.make_iteration(keep_history=False, keep_images=True)
    out_x = jax.tree_util.tree_map(
        np.asarray, it(pipe.params, jax.random.key(2)))
    return out_f, out_x


def _assert_binomial_close(k1, k2, n, nsigma=5.0):
    """Two independent binomial draws of n trials agree within nsigma."""
    p = (k1 + k2) / (2.0 * n)
    sigma = np.sqrt(max(2.0 * n * p * (1.0 - p), 1.0))
    assert abs(k1 - k2) < nsigma * sigma, (k1, k2, sigma)


class TestSpectrometerParity:
    def test_meta_counts(self):
        n = 1 << 16
        out_f, out_x = _run_both(_spectrometer(n))
        assert int(out_f["meta"]["source"]) == n
        for name in ("aperture", "crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        # Counts flow downhill and images integrate to their element counts.
        assert int(out_f["meta"]["crystal"]) <= int(out_f["meta"]["aperture"])
        for name in ("crystal", "detector"):
            assert out_f["image"][name].sum() == int(out_f["meta"][name])

    def test_image_distribution(self):
        """Coarse-grained detector images agree by chi-square."""
        n = 1 << 17
        out_f, out_x = _run_both(_spectrometer(n))
        f = out_f["image"]["detector"]
        x = out_x["image"]["detector"]
        assert f.shape == x.shape
        # 10x10 superpixels
        sx, sy = f.shape[0] // 10, f.shape[1] // 10
        cf = f[: 10 * sx, : 10 * sy].reshape(10, sx, 10, sy).sum((1, 3))
        cx = x[: 10 * sx, : 10 * sy].reshape(10, sx, 10, sy).sum((1, 3))
        keep = (cf + cx) > 50
        assert keep.sum() > 0
        chi2 = ((cf - cx) ** 2 / (cf + cx + 1e-12))[keep].sum()
        ndof = int(keep.sum())
        assert chi2 < ndof + 5.0 * np.sqrt(2.0 * ndof), (chi2, ndof)

    def test_multi_iteration(self):
        out_f, _ = _run_both(_spectrometer(4096, number_of_iter=3))
        assert int(out_f["meta"]["source"]) == 3 * 4096


class TestOpticVariants:
    def test_plane_mirror_sphere_chain(self):
        """Mirror fold (plane) + step-rocking flat crystal."""
        n = 1 << 15
        config = {
            "general": {"number_of_iter": 1, "random_seed": 0,
                        "keep_history": False, "print_results": False},
            "sources": {"source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": n, "wavelength": 3.9492,
                "angular_dist": "isotropic", "spread": np.radians(5.0),
            }},
            "optics": {
                "mirror": {
                    "class_name": "XicsrtOpticPlanarMirror",
                    "origin": [0.0, 0.0, 0.5],
                    "zaxis": [0.0, 0.3826834, -0.9238795],
                    "xsize": 0.5, "ysize": 0.5,
                },
                # On the folded beam (direction (0, 1, -1)/sqrt2), normal
                # (0,-1,0): incidence = 45 deg = the Bragg angle for
                # spacing = wavelength / (2 sin 45).
                "crystal": {
                    "class_name": "XicsrtOpticPlanarCrystal",
                    "origin": [0.0, 0.21213203, 0.28786797],
                    "zaxis": [0.0, -1.0, 0.0],
                    "xsize": 0.5, "ysize": 0.5,
                    "crystal_spacing": 3.9492 / (2.0 * np.sin(np.pi / 4)),
                    "rocking_type": "step",
                    "rocking_fwhm": 5e-3,
                },
            },
        }
        out_f, out_x = _run_both(config)
        for name in ("mirror", "crystal"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["mirror"]) > 0
        assert int(out_f["meta"]["crystal"]) > 0

    def _steep_bragg_config(self, n, glancing, bragg, wavelength=3.9492):
        tilt = np.pi / 2 - glancing  # crystal normal tilt off the beam axis
        return {
            "general": {"number_of_iter": 1, "random_seed": 0,
                        "keep_history": False, "print_results": False},
            "sources": {"source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": n, "wavelength": wavelength,
                "angular_dist": "isotropic", "spread": 1e-5,
            }},
            "optics": {"crystal": {
                "class_name": "XicsrtOpticPlanarCrystal",
                "origin": [0.0, 0.0, 0.5],
                "zaxis": [0.0, np.sin(tilt), -np.cos(tilt)],
                "xsize": 0.5, "ysize": 0.5,
                "crystal_spacing": wavelength / (2.0 * np.sin(bragg)),
                "rocking_type": "gaussian", "rocking_fwhm": 5e-3,
            }},
        }

    def test_steep_bragg_no_spurious_acceptance(self):
        """Regression (round-2 advisor): the Taylor Bragg deviation had a
        spurious zero at adot = sin_b - 2 cos_b^2/sin_b for Bragg angles
        above ~54.7 deg, accepting rays at a wrong incidence with full
        reflectivity. The sine-difference form has no such zero."""
        n = 1 << 12
        bragg = np.radians(70.0)
        sin_b, cos_b = np.sin(bragg), np.cos(bragg)
        spurious = np.arcsin(sin_b - 2.0 * cos_b**2 / sin_b)
        pipe = Pipeline(self._steep_bragg_config(n, spurious, bragg))
        fused = build_fused_run(pipe, chunk=2048, interpret=True)
        out = jax.tree_util.tree_map(np.asarray, fused(jax.random.key(0)))
        assert int(out["meta"]["crystal"]) == 0

        # Control: at the true Bragg angle the same crystal reflects fully.
        pipe = Pipeline(self._steep_bragg_config(n, bragg, bragg))
        fused = build_fused_run(pipe, chunk=2048, interpret=True)
        out = jax.tree_util.tree_map(np.asarray, fused(jax.random.key(0)))
        assert int(out["meta"]["crystal"]) == n

    def test_convex_sphere(self):
        n = 1 << 14
        config = {
            "general": {"number_of_iter": 1, "random_seed": 0,
                        "keep_history": False, "print_results": False},
            "sources": {"source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": n, "wavelength": 3.9492,
                "angular_dist": "isotropic", "spread": np.radians(3.0),
            }},
            "optics": {"mirror": {
                "class_name": "XicsrtOpticSphericalMirror",
                "origin": [0.0, 0.0, 0.5],
                "zaxis": [0.0, 0.0, -1.0],
                "xsize": 0.3, "ysize": 0.3,
                "radius": 2.0, "convex": True,
            }},
        }
        out_f, out_x = _run_both(config)
        _assert_binomial_close(
            int(out_f["meta"]["mirror"]), int(out_x["meta"]["mirror"]), n)
        assert int(out_f["meta"]["mirror"]) > 0


class TestFoundHistoryReservoir:
    """keep_history='found' on the fused engine: bounded in-kernel
    reservoir of the chunks that produced detector hits (round-3 verdict
    #5; reference full-history contract ``xicsrt_raytrace.py:229-278``)."""

    def _run(self, n=1 << 14, slots=4, **general):
        config = _spectrometer(
            n, engine="fused", keep_history="found",
            history_found_slots=slots, **general,
        )
        return raytrace(config)

    def test_found_history_populated_and_consistent(self):
        result = self._run()
        found = result["found"]["history"]
        assert set(found) == {"source", "aperture", "crystal", "detector"}
        n_found = found["detector"]["origin"].shape[0]
        n_det = result["total"]["meta"]["detector"]["num_out"]
        assert n_found > 0
        # Detector hits fit in the reservoir here -> found is COMPLETE.
        assert n_found == n_det, (n_found, n_det)
        # Found rays survive every element by construction.
        for name in ("source", "aperture", "crystal", "detector"):
            assert found[name]["mask"].all(), name
            assert found[name]["origin"].shape == (n_found, 3)
        # Lost sample: the reservoir chunks' non-surviving rays.
        lost = result["lost"]["history"]
        assert lost["detector"]["origin"].shape[0] > 0
        assert not lost["detector"]["mask"].any()
        # Found detector hits actually sit in the detector plane's bounds:
        # their positions differ per ray (real states, not zeros).
        assert np.std(found["detector"]["origin"][:, 0]) > 0

    def test_reservoir_bounds_found_count(self):
        """With a 1-slot reservoir only one chunk's worth of found rays
        comes back — the bounded-memory contract."""
        full = self._run(slots=4)
        capped = self._run(slots=1)
        n_full = full["found"]["history"]["detector"]["origin"].shape[0]
        n_capped = capped["found"]["history"]["detector"]["origin"].shape[0]
        assert 0 < n_capped < n_full

    def test_found_history_feeds_plot_intersect(self):
        import matplotlib

        matplotlib.use("Agg")
        from xicsrt_tpu.visual.plot2d import plot_intersect

        result = self._run()
        fig_or_ax = plot_intersect(result, "detector")
        assert fig_or_ax is not None

    def test_sharded_reservoir(self):
        """keep_history='found' composes with the sharded fused engine:
        each device fills its own reservoir; history arrays shard on the
        ray axis while meta/images stay psum-reduced."""
        import numpy as np_

        from xicsrt_tpu.parallel import make_sharded_run

        config = _spectrometer(
            1 << 13, engine="fused", keep_history="found",
            history_found_slots=2,
        )
        fn, pipeline, mesh = make_sharded_run(config, n_devices=8)
        out = fn(pipeline.params, jax.random.key(0))
        n_gen = int(np_.asarray(out["meta"]["source"]))
        assert n_gen == 1 << 13
        hist = out["history"]["detector"]
        # 8 devices x (2 slots x chunk) reservoir rows, axis-0 sharded.
        assert hist.origin.shape[0] == 8 * 2 * 8192
        found = np_.asarray(hist.mask)
        n_det = int(np_.asarray(out["meta"]["detector"]))
        assert 0 < found.sum() <= n_det

    def test_weight_mode_reservoir(self):
        result = self._run(interact_mode="weight")
        found = result["found"]["history"]
        w = found["detector"]["weight"]
        assert w.shape[0] > 0
        # Bragg acceptance multiplies weights into [0, 1] (exact 0 from
        # exp underflow far off the rocking curve; rays stay alive in
        # weight mode — only bounds kill).
        assert (w >= 0).all() and (w <= 1.0).all()
        assert (0.0 < w[w < 1.0]).any()


class TestSampledHistoryReservoir:
    """keep_history='sampled' on the fused engine: the first S chunks
    form an unbiased bounded sample of ALL generated rays; the host
    split honors history_max_lost (round-4 verdict #5; reference
    truncated-lost semantics ``xicsrt_raytrace.py:261-266``)."""

    def _run(self, n=1 << 14, **general):
        config = _spectrometer(
            n, engine="fused", keep_history="sampled", **general,
        )
        return raytrace(config)

    def test_sampled_history_has_found_and_lost(self):
        result = self._run()
        found = result["found"]["history"]
        lost = result["lost"]["history"]
        assert set(lost) == {"source", "aperture", "crystal", "detector"}
        n_lost = lost["detector"]["origin"].shape[0]
        n_found = found["detector"]["origin"].shape[0]
        assert n_lost > 0 and n_found > 0
        # Lost rays were born but never reached the detector.
        assert lost["source"]["mask"].all()
        assert not lost["detector"]["mask"].any()
        assert found["detector"]["mask"].all()
        # Real per-ray states, not zero fill.
        assert np.std(lost["source"]["direction"][:, 0]) > 0
        # The sample is unbiased: its found fraction matches the run's
        # efficiency within a binomial band.
        n_sample = n_lost + n_found
        eff = (result["total"]["meta"]["detector"]["num_out"]
               / result["total"]["meta"]["source"]["num_out"])
        sigma = np.sqrt(max(eff * (1 - eff) * n_sample, 1.0))
        assert abs(n_found - eff * n_sample) < 8 * sigma + 1, (
            n_found, eff * n_sample, n_sample)

    def test_history_max_lost_truncates(self):
        cap = 100
        result = self._run(history_max_lost=cap)
        n_lost = result["lost"]["history"]["detector"]["origin"].shape[0]
        assert 0 < n_lost <= cap

    def test_sampled_history_feeds_plot_intersect(self):
        import matplotlib

        matplotlib.use("Agg")
        from xicsrt_tpu.visual.plot2d import plot_intersect

        result = self._run()
        assert plot_intersect(result, "detector") is not None

    def test_degradation_to_full_history_warns(self, caplog):
        """engine='auto' + a config outside the fused subset: the bounded
        reservoir silently degrading to FULL per-ray history must warn
        (round-4 advisor finding)."""
        import logging

        from xicsrt_tpu.engine import build_runner

        config = _spectrometer(1 << 10, engine="auto",
                               keep_history="sampled")
        # Faceted mesh optics are outside every fused path.
        config["optics"]["crystal"] = {
            "class_name": "XicsrtOpticMeshCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2,
            "mesh_points": [[-0.1, -0.1, 0.0], [0.1, -0.1, 0.0],
                            [-0.1, 0.1, 0.0], [0.1, 0.1, 0.0]],
            "mesh_faces": [[0, 1, 2], [1, 3, 2]],
            "mesh_interpolate": False,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 48.070e-6,
        }
        with caplog.at_level(logging.WARNING, logger="xicsrt_tpu"):
            build_runner(config)
        assert any("degrades to FULL per-ray history" in r.message
                   for r in caplog.records), caplog.records


class TestWidenedSubset:
    """Round-3 widening: extended/Poisson/voigt/focused sources and
    cylinder/torus shapes run on the fused engine and agree with the XLA
    engine distributionally."""

    def test_extended_voigt_source(self):
        n = 1 << 15
        config = _spectrometer(n)
        src = config["sources"]["source"]
        src.update(xsize=0.01, ysize=0.01, zsize=0.005,
                   wavelength_dist="voigt", linewidth=1e12,
                   temperature=500.0, mass_number=40.0)
        config["optics"]["crystal"]["rocking_fwhm"] = 200e-6
        out_f, out_x = _run_both(config)
        assert int(out_f["meta"]["source"]) == n
        for name in ("aperture", "crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_gaussian_spatial_uniform_wavelength_velocity(self):
        n = 1 << 15
        config = _spectrometer(n)
        src = config["sources"]["source"]
        src.update(spatial_dist="gaussian", xsize=0.01, ysize=0.01,
                   zsize=0.0, wavelength_dist="uniform",
                   wavelength_range=[3.94, 3.96],
                   velocity=[0.0, 0.0, 1e5])
        config["optics"]["crystal"]["rocking_fwhm"] = 200e-6
        out_f, out_x = _run_both(config)
        for name in ("aperture", "crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)

    def test_poisson_budget(self):
        n = 20000
        config = _spectrometer(n)
        config["sources"]["source"]["use_poisson"] = True
        pipe = Pipeline(config)
        fused = build_fused_run(pipe, chunk=8192, interpret=True)
        out = jax.tree_util.tree_map(np.asarray, fused(jax.random.key(3)))
        n_gen = int(out["meta"]["source"])
        assert abs(n_gen - n) < 6 * np.sqrt(n), n_gen
        assert n_gen != n  # actually random, not the clipped budget
        assert out["image"]["detector"].sum() == int(out["meta"]["detector"])

    def test_focused_source(self):
        n = 1 << 15
        config = _spectrometer(n)
        src = config["sources"]["source"]
        src.pop("angular_dist")
        src.update(class_name="XicsrtSourceFocused",
                   target=[0.0, 0.0, 0.80374151],
                   xsize=0.02, ysize=0.02, zsize=0.0,
                   spread=np.radians(8.0))
        out_f, out_x = _run_both(config)
        for name in ("aperture", "crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)

    @pytest.mark.parametrize("dist,spread", [
        ("flat", np.radians(8.0)),
        ("flat_xy", [np.radians(6.0), np.radians(9.0)]),
        ("gaussian", np.radians(4.0)),
        ("isotropic_xy", [-np.radians(4.0), np.radians(9.0),
                          -np.radians(7.0), np.radians(7.0)]),
    ])
    def test_angular_distributions(self, dist, spread):
        n = 1 << 15
        config = _spectrometer(n)
        config["sources"]["source"]["angular_dist"] = dist
        config["sources"]["source"]["spread"] = spread
        out_f, out_x = _run_both(config)
        for name in ("aperture", "crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)

    def _crystal_config(self, n, crystal):
        return {
            "general": {"number_of_iter": 1, "random_seed": 0,
                        "keep_history": False, "print_results": False},
            "sources": {"source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": n, "wavelength": 3.9492,
                "angular_dist": "isotropic_xy", "spread": np.radians(10.0),
            }},
            "optics": {
                "crystal": crystal,
                "detector": {
                    "class_name": "XicsrtOpticDetector",
                    "origin": [0.0, 0.76871290, 0.56904832],
                    "zaxis": [0.0, -0.95641806, 0.29200084],
                    "xsize": 0.4, "ysize": 0.2,
                },
            },
        }

    def test_cylindrical_crystal(self):
        n = 1 << 15
        crystal = {
            "class_name": "XicsrtOpticCylindricalCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 150e-6,
        }
        out_f, out_x = _run_both(self._crystal_config(n, crystal))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_toroidal_crystal(self):
        n = 1 << 15
        crystal = {
            "class_name": "XicsrtOpticToroidalCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2,
            "radius_major": 1.0, "radius_minor": 0.64,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 150e-6,
        }
        out_f, out_x = _run_both(self._crystal_config(n, crystal))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_file_rocking_curve(self, tmp_path):
        """rocking_type='file' on the fused engine: the tent-matvec
        interpolation of the resampled XOP table matches the XLA engine's
        jnp.interp acceptance."""
        from tests.test_coverage_extra import _write_xop_file

        xop = tmp_path / "diff_pat.dat"
        _write_xop_file(str(xop), fwhm=150e-6)
        n = 1 << 15
        crystal = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "file", "rocking_fwhm": None,
            "rocking_file": str(xop), "rocking_filetype": "xop",
            "rocking_mix": 0.7,
        }
        out_f, out_x = _run_both(self._crystal_config(n, crystal))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_mosaic_crystal(self):
        """Fused unrolled mosaic loop vs the XLA fori_loop mosaic."""
        n = 1 << 15
        crystal = {
            "class_name": "XicsrtOpticSphericalMosaicCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 150e-6,
            "mosaic_spread": np.radians(0.05), "mosaic_depth": 10,
        }
        out_f, out_x = _run_both(self._crystal_config(n, crystal))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_mosaic_cutoff(self):
        n = 1 << 14
        crystal = {
            "class_name": "XicsrtOpticSphericalMosaicCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 150e-6,
            "mosaic_spread": np.radians(0.05), "mosaic_depth": 10,
            "mosaic_cutoff": 1e-4,
        }
        out_f, out_x = _run_both(self._crystal_config(n, crystal))
        _assert_binomial_close(
            int(out_f["meta"]["crystal"]), int(out_x["meta"]["crystal"]), n)

    @pytest.mark.parametrize("convex", [[True, True], [True, False],
                                        [False, True]])
    def test_convex_torus_mirror(self, convex):
        """The fused Newton torus solver on every convex-flag geometry
        (regression guard for the quartic -> Newton swap)."""
        n = 1 << 14
        crystal = {
            "class_name": "XicsrtOpticToroidalCrystal",
            "origin": [0.0, 0.0, 0.5],
            "zaxis": [0.0, 0.0, -1.0],
            "xsize": 0.15, "ysize": 0.15,
            "radius_major": 1.0, "radius_minor": 0.5,
            "convex": convex, "check_bragg": False,
            "crystal_spacing": 2.45676,
        }
        config = self._crystal_config(n, crystal)
        config["sources"]["source"]["angular_dist"] = "isotropic"
        config["sources"]["source"]["spread"] = np.radians(3.0)
        del config["optics"]["detector"]
        out_f, out_x = _run_both(config)
        _assert_binomial_close(
            int(out_f["meta"]["crystal"]), int(out_x["meta"]["crystal"]), n)
        assert int(out_f["meta"]["crystal"]) > 0

    def test_torus_wide_spread_grazing(self):
        """Wide-spread illumination reaching the tube silhouette (ADVICE
        r3): grazing incidence is where the in-kernel Newton solver's
        surface gradient along the ray goes to zero and non-convergence
        would silently turn hits into misses (the XLA quartic enumerates
        all roots). Counts AND the spatial hit distribution on the crystal
        must match — localized convergence failures would concentrate in
        the silhouette cells of the image."""
        n = 1 << 15
        # Tube minor radius 0.1 at 0.4 m from the source: the silhouette
        # sits at asin(0.1/0.4) ~ 14.5 deg off-axis, well inside the
        # 28-deg cone — a broad band of rays passes the tangency region.
        crystal = {
            "class_name": "XicsrtOpticToroidalCrystal",
            "origin": [0.0, 0.0, 0.5],
            "zaxis": [0.0, 0.0, -1.0],
            "xsize": 0.5, "ysize": 0.5,
            "radius_major": 1.0, "radius_minor": 0.1,
            "check_bragg": False, "crystal_spacing": 2.45676,
            "pixel_size": 0.03125,  # 16 x 16 crystal intersection image
        }
        config = self._crystal_config(n, crystal)
        config["sources"]["source"]["angular_dist"] = "isotropic"
        config["sources"]["source"]["spread"] = np.radians(28.0)
        del config["optics"]["detector"]
        out_f, out_x = _run_both(config)
        kf = int(out_f["meta"]["crystal"])
        kx = int(out_x["meta"]["crystal"])
        _assert_binomial_close(kf, kx, n)
        # Non-vacuous: the patch vignettes part of the wide cone, so the
        # silhouette region is actually sampled.
        assert 0 < kf < int(0.95 * n), kf
        f = out_f["image"]["crystal"]
        x = out_x["image"]["crystal"]
        sp = lambda a: a.reshape(8, 2, 8, 2).sum(axis=(1, 3))  # noqa: E731
        F, X = sp(f), sp(x)
        keep = (F + X) > 30
        assert keep.sum() >= 8, keep.sum()
        chi2 = (((F - X) ** 2)[keep] / (F + X)[keep]).sum()
        assert chi2 / keep.sum() < 3.0, chi2 / keep.sum()

    def test_torus_solver_per_ray_parity_sweep(self):
        """PER-RAY parity of the fused local-quadratic torus root vs the
        XLA quartic on the SAME rays (round-4 verdict #7: the
        distributional tests above cannot see a thin silhouette band of
        silent misses).

        Two sweeps against a concave R=1.0/r=0.2 torus patch:
        (a) a parallel beam whose impact parameter crosses the tube
        silhouette at |y| = r — disagreements must be rarer than 5e-5
        and confined to within 1e-4 of the exact tangency line;
        (b) a 20-degree random cone from an instrument-like point —
        zero-tolerance band: < 1e-4 disagreement rate, f32-level |t|
        error on agreed hits. Measured on this sweep: 2/200001
        disagreements, both AT |y| = r exactly; 0/200000 on the cone.
        """
        import jax.numpy as jnp

        from xicsrt_tpu.ops.fused_trace import (
            _optic_spec, torus_local_quadratic_t,
        )
        from xicsrt_tpu.rays import Rays

        config = {
            "general": {"number_of_iter": 1, "random_seed": 0,
                        "print_results": False, "keep_history": False},
            "sources": {"source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": 16, "wavelength": 3.9492}},
            "optics": {"crystal": {
                "class_name": "XicsrtOpticToroidalCrystal",
                "origin": [0.0, 0.0, 0.0], "zaxis": [0.0, 0.0, 1.0],
                "xsize": 2.0, "ysize": 2.0,
                "radius_major": 1.0, "radius_minor": 0.2,
                "crystal_spacing": 2.45676, "rocking_type": "gaussian",
                "rocking_fwhm": 1e-3, "check_bragg": False}},
        }
        pipe = Pipeline(config)
        optic = pipe.optics[0]
        spec = _optic_spec(optic, 3.9492, False, "mc")
        intersect = optic.make_intersect()
        oparams = pipe.params["optics"]["crystal"]
        f32 = jnp.float32

        def both(origin, direction):
            n = origin.shape[0]
            rays = Rays(origin=jnp.asarray(origin),
                        direction=jnp.asarray(direction),
                        wavelength=jnp.full((n,), 3.9492),
                        weight=jnp.ones((n,)),
                        mask=jnp.ones((n,), bool))
            t_x, _, m_x = intersect(oparams, rays)
            t_f, m_f, _, _ = torus_local_quadratic_t(
                spec,
                jnp.asarray(origin[:, 0], f32),
                jnp.asarray(origin[:, 1], f32),
                jnp.asarray(origin[:, 2], f32),
                jnp.asarray(direction[:, 0], f32),
                jnp.asarray(direction[:, 1], f32),
                jnp.asarray(direction[:, 2], f32),
                jnp.ones((n,), bool))
            return (np.asarray(t_x), np.asarray(m_x),
                    np.asarray(t_f), np.asarray(m_f))

        # (a) impact-parameter sweep across the silhouette.
        n = 50001
        y = np.linspace(-0.25, 0.25, n)
        origin = np.stack([np.zeros(n), y, np.full(n, 1.0)], axis=1)
        direction = np.tile(np.array([0.0, 0.0, -1.0]), (n, 1))
        t_x, m_x, t_f, m_f = both(origin, direction)
        dis = m_x != m_f
        assert dis.mean() < 5e-5, dis.mean()
        if dis.any():
            assert np.abs(np.abs(y[dis]) - 0.2).max() < 1e-4
        agreed = m_x & m_f
        assert agreed.sum() > 0.7 * n
        assert np.abs(t_x[agreed] - t_f[agreed]).max() < 1e-4

        # (b) 20-degree cone from a point (the instrument geometry).
        rng = np.random.default_rng(0)
        m = 50000
        tx = np.tan(np.radians(20.0)) * (2 * rng.random(m) - 1)
        ty = np.tan(np.radians(20.0)) * (2 * rng.random(m) - 1)
        d = np.stack([tx, ty, -np.ones(m)], axis=1)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        origin = np.tile(np.array([0.0, 0.0, 1.0]), (m, 1))
        t_x, m_x, t_f, m_f = both(origin, d)
        dis = m_x != m_f
        assert dis.mean() < 1e-4, dis.mean()
        agreed = m_x & m_f
        assert agreed.sum() > 0.5 * m
        assert np.abs(t_x[agreed] - t_f[agreed]).max() < 1e-4

    def test_convex_cylinder_mirror(self):
        n = 1 << 14
        crystal = {
            "class_name": "XicsrtOpticCylindricalMirror",
            "origin": [0.0, 0.0, 0.5],
            "zaxis": [0.0, 0.0, -1.0],
            "xsize": 0.3, "ysize": 0.3, "radius": 2.0, "convex": True,
        }
        config = self._crystal_config(n, crystal)
        config["sources"]["source"]["angular_dist"] = "isotropic"
        config["sources"]["source"]["spread"] = np.radians(3.0)
        del config["optics"]["detector"]
        out_f, out_x = _run_both(config)
        _assert_binomial_close(
            int(out_f["meta"]["crystal"]), int(out_x["meta"]["crystal"]), n)
        assert int(out_f["meta"]["crystal"]) > 0


class TestMeshSurrogate:
    """Fused mesh optics: the Chebyshev height-field surrogate
    (``_fit_cheb_surface``) vs the XLA grid-pruned triangle path, plus the
    honest fallbacks for meshes outside the smooth-surface assumption."""

    def _mesh_config(self, n, cls, **kw):
        crystal = {
            "class_name": cls,
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 150e-6,
        }
        crystal.update(kw)
        return {
            "general": {"number_of_iter": 1, "random_seed": 0,
                        "keep_history": False, "print_results": False},
            "sources": {"source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": n, "wavelength": 3.9492,
                "angular_dist": "isotropic_xy", "spread": np.radians(10.0),
            }},
            "optics": {
                "crystal": crystal,
                "detector": {
                    "class_name": "XicsrtOpticDetector",
                    "origin": [0.0, 0.76871290, 0.56904832],
                    "zaxis": [0.0, -0.95641806, 0.29200084],
                    "xsize": 0.4, "ysize": 0.2,
                },
            },
        }

    @pytest.mark.parametrize("cls,kw", [
        ("XicsrtOpticMeshSphericalCrystal",
         dict(radius=1.0, mesh_size=(41, 41), mesh_coarse_size=(11, 11))),
        ("XicsrtOpticMeshCylindricalCrystal",
         dict(radius=1.0, mesh_size=(41, 41), mesh_coarse_size=(11, 11))),
        ("XicsrtOpticMeshToroidalCrystal",
         dict(radius_major=1.0, radius_minor=0.64, mesh_size=(41, 41),
              mesh_coarse_size=(11, 11), rocking_fwhm=2e-3)),
    ])
    def test_mesh_crystal_parity(self, cls, kw):
        n = 1 << 15
        out_f, out_x = _run_both(self._mesh_config(n, cls, **kw))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_mesh_matches_analytic_sphere(self):
        """The surrogate of a spherical mesh agrees with the analytic
        sphere (integrated_test_01's analytic-vs-mesh axis)."""
        n = 1 << 15
        out_m, _ = _run_both(self._mesh_config(
            n, "XicsrtOpticMeshSphericalCrystal", radius=1.0,
            mesh_size=(41, 41), mesh_coarse_size=(11, 11)))
        out_a, _ = _run_both(self._mesh_config(
            n, "XicsrtOpticSphericalCrystal", radius=1.0))
        _assert_binomial_close(int(out_m["meta"]["detector"]),
                               int(out_a["meta"]["detector"]), n)

    def test_faceted_mesh_falls_back(self):
        config = self._mesh_config(
            1024, "XicsrtOpticMeshSphericalCrystal", radius=1.0,
            mesh_size=(21, 21), mesh_coarse_size=(11, 11),
            mesh_interpolate=False)
        with pytest.raises(FusedUnsupported, match="faceted"):
            build_fused_run(Pipeline(config), chunk=1024, interpret=True)

    def test_rough_mesh_falls_back(self):
        """A surface too rough for a smooth height-field fit stays on the
        exact XLA triangle path instead of silently mis-tracing."""
        from xicsrt_tpu.optics.mesh_shapes import grid_faces

        nx, ny = 21, 21
        xg, yg = np.meshgrid(np.linspace(-0.1, 0.1, nx),
                             np.linspace(-0.1, 0.1, ny), indexing="ij")
        rng = np.random.default_rng(0)
        zg = 0.02 * np.sin(40 * xg) * np.cos(37 * yg) + rng.normal(
            0.0, 1e-3, xg.shape)
        pts = np.stack([xg.ravel(), yg.ravel(), zg.ravel()], axis=-1)
        normals = np.zeros_like(pts)
        normals[:, 2] = 1.0
        config = self._mesh_config(
            1024, "XicsrtOpticMeshCrystal", mesh_points=pts,
            mesh_normals=normals, mesh_faces=grid_faces(nx, ny),
            trace_local=True)
        with pytest.raises(FusedUnsupported):
            build_fused_run(Pipeline(config), chunk=1024, interpret=True)

    def test_mesh_with_plasma_hybrid(self):
        """Mesh optics compose with the trace-only plasma path."""
        from xicsrt_tpu.ops.fused_trace import build_fast_run

        config = self._mesh_config(
            0, "XicsrtOpticMeshSphericalCrystal", radius=1.0,
            mesh_size=(41, 41), mesh_coarse_size=(11, 11),
            rocking_fwhm=2e-3)
        config["sources"] = {"plasma": {
            "class_name": "XicsrtPlasmaCubic",
            "origin": [0.0, 0.0, 0.0],
            "xsize": 0.02, "ysize": 0.02, "zsize": 0.02,
            "target": [0.0, 0.0, 0.80374151],
            "spread": np.radians(10.0),
            "emissivity": 2e14, "temperature": 500.0, "mass_number": 40.0,
            "wavelength": 3.9492, "time_resolution": 1e-3,
            "bundle_volume": 1e-6, "bundle_count": 100,
            "use_poisson": True,
        }}
        pipe = Pipeline(config)
        run, kind = build_fast_run(pipe, interpret=True, chunk=4096)
        assert kind == "fused"
        out = jax.tree_util.tree_map(np.asarray, run(jax.random.key(0)))
        assert int(out["meta"]["plasma"]) > 0
        assert int(out["meta"]["crystal"]) > 0


class TestModesParity:
    """Round-3 widening: weight interaction mode, bilinear image binning,
    asymmetric-y isotropic_xy and mosaic+file rocking in the fused kernel."""

    def _superpixel_chi2(self, f, x, coarse=10, min_count=50):
        sx, sy = f.shape[0] // coarse, f.shape[1] // coarse
        cf = f[: coarse * sx, : coarse * sy].reshape(
            coarse, sx, coarse, sy).sum((1, 3))
        cx = x[: coarse * sx, : coarse * sy].reshape(
            coarse, sx, coarse, sy).sum((1, 3))
        keep = (cf + cx) > min_count
        assert keep.sum() > 0
        chi2 = ((cf - cx) ** 2 / (cf + cx + 1e-12))[keep].sum()
        ndof = int(keep.sum())
        assert chi2 < ndof + 5.0 * np.sqrt(2.0 * ndof), (chi2, ndof)

    def test_weight_mode_matches_xla_weight_mode(self):
        n = 1 << 16
        config = _spectrometer(n, interact_mode="weight")
        out_f, out_x = _run_both(config)
        # Geometric survivor counts (the mask never includes the Bragg
        # acceptance in weight mode) agree binomially.
        for name in ("aperture", "crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        # The weighted detector image integrates to the expected photon
        # count; weight-mode variance is far below Poisson, so 5 sigma of
        # the MC-mode count is a generous envelope.
        sf = float(out_f["image"]["detector"].sum())
        sx = float(out_x["image"]["detector"].sum())
        assert abs(sf - sx) < 5.0 * np.sqrt(max(sf + sx, 1.0)), (sf, sx)
        self._superpixel_chi2(out_f["image"]["detector"],
                              out_x["image"]["detector"])

    def test_weight_vs_mc_expected_detector_flux(self):
        """Weight mode and mc mode estimate the same expected image."""
        n = 1 << 16
        out_w, _ = _run_both(_spectrometer(n, interact_mode="weight"))
        out_m, _ = _run_both(_spectrometer(n))
        sw = float(out_w["image"]["detector"].sum())
        sm = float(out_m["image"]["detector"].sum())
        assert abs(sw - sm) < 5.0 * np.sqrt(max(sm, 1.0)), (sw, sm)

    def test_bilinear_images(self):
        n = 1 << 16
        config = _spectrometer(n, image_mode="bilinear")
        out_f, out_x = _run_both(config)
        f = out_f["image"]["detector"]
        x = out_x["image"]["detector"]
        # Bilinear splat preserves each in-bounds ray's unit of flux.
        assert abs(f.sum() - int(out_f["meta"]["detector"])) < 1.0
        self._superpixel_chi2(f, x)

    def test_bilinear_weight_mode(self):
        n = 1 << 15
        config = _spectrometer(
            n, image_mode="bilinear", interact_mode="weight")
        out_f, out_x = _run_both(config)
        sf = float(out_f["image"]["detector"].sum())
        sx = float(out_x["image"]["detector"].sum())
        assert sf > 0
        assert abs(sf - sx) < 5.0 * np.sqrt(max(sf + sx, 1.0)), (sf, sx)

    def test_asymmetric_y_isotropic_xy(self):
        n = 1 << 15
        config = _spectrometer(n)
        config["sources"]["source"]["spread"] = [
            -np.radians(4.0), np.radians(9.0),
            -np.radians(5.0), np.radians(8.0),
        ]
        out_f, out_x = _run_both(config)
        for name in ("aperture", "crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_mosaic_file_rocking(self, tmp_path):
        from tests.test_coverage_extra import _write_xop_file

        xop = tmp_path / "diff_pat.dat"
        _write_xop_file(str(xop), fwhm=150e-6)
        n = 1 << 15
        config = _spectrometer(n)
        config["optics"]["crystal"].update(
            class_name="XicsrtOpticSphericalMosaicCrystal",
            rocking_type="file", rocking_fwhm=None,
            rocking_file=str(xop), rocking_filetype="xop",
            rocking_mix=0.6,
            mosaic_spread=np.radians(0.05), mosaic_depth=8,
        )
        out_f, out_x = _run_both(config)
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out_f["meta"]["detector"]) > 0

    def test_sightline_filtered_source(self):
        """Position-based ray filters run IN the megakernel (round-3
        widening); counts match the XLA engine's ray_filter."""
        n = 1 << 15
        config = _spectrometer(n)
        config["sources"]["source"].update(
            xsize=0.06, ysize=0.06, zsize=0.0, filters=["sight"])
        config["filters"] = {"sight": {
            "class_name": "XicsrtBundleFilterSightline",
            "origin": [0.01, 0.0, 0.0],
            "zaxis": [0.0, 0.0, 1.0],
            "radius": 0.02,
        }}
        pipe = Pipeline(config)
        from xicsrt_tpu.ops.fused_trace import build_fast_run

        run, kind = build_fast_run(pipe, interpret=True, chunk=8192)
        assert kind == "fused"
        out_f = jax.tree_util.tree_map(np.asarray, run(jax.random.key(1)))
        it = pipe.make_iteration(keep_history=False, keep_images=True)
        out_x = jax.tree_util.tree_map(
            np.asarray, it(pipe.params, jax.random.key(2)))
        # The filter must actually cut (circle r=0.02 inside a 0.06 box).
        assert int(out_f["meta"]["source"]) < 0.6 * n
        for name in ("source", "aperture", "crystal"):
            _assert_binomial_close(
                int(out_f["meta"][name]), int(out_x["meta"][name]), n)

    def test_mosaic_weight_mode(self):
        n = 1 << 15
        config = _spectrometer(n, interact_mode="weight")
        config["optics"]["crystal"].update(
            class_name="XicsrtOpticSphericalMosaicCrystal",
            rocking_fwhm=150e-6,
            mosaic_spread=np.radians(0.05), mosaic_depth=8,
        )
        out_f, out_x = _run_both(config)
        sf = float(out_f["image"]["detector"].sum())
        sx = float(out_x["image"]["detector"].sum())
        assert sf > 0
        assert abs(sf - sx) < 5.0 * np.sqrt(max(sf + sx, 1.0)), (sf, sx)


class TestFusedTraceHybrid:
    """Plasma sources on the fused paths: the in-kernel bundle sampler
    (megakernel, round-3) and the trace-only streaming kernel (fallback
    for ray-filtered sources and >4096 bundles)."""

    def _plasma_config(self, **crystal_overrides):
        crystal = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 150e-6,
        }
        crystal.update(crystal_overrides)
        return {
            "general": {"number_of_iter": 1, "random_seed": 0,
                        "keep_history": False, "print_results": False},
            "sources": {"plasma": {
                "class_name": "XicsrtPlasmaCubic",
                "origin": [0.0, 0.0, 0.0],
                "xsize": 0.02, "ysize": 0.02, "zsize": 0.02,
                "target": [0.0, 0.0, 0.80374151],
                "spread": np.radians(10.0),
                "emissivity": 2e12,
                "temperature": 500.0,
                "mass_number": 40.0,
                "wavelength": 3.9492,
                "time_resolution": 1e-3,
                "bundle_volume": 1e-6,
                "bundle_count": 100,
                "use_poisson": True,
            }},
            "optics": {
                "crystal": crystal,
                "detector": {
                    "class_name": "XicsrtOpticDetector",
                    "origin": [0.0, 0.76871290, 0.56904832],
                    "zaxis": [0.0, -0.95641806, 0.29200084],
                    "xsize": 0.4, "ysize": 0.2,
                },
            },
        }

    def test_plasma_spherical(self):
        from xicsrt_tpu.ops.fused_trace import build_fast_run

        pipe = Pipeline(self._plasma_config())
        run, kind = build_fast_run(pipe, interpret=True, chunk=4096)
        assert kind == "fused"  # in-kernel bundle sampling
        out = jax.tree_util.tree_map(np.asarray, run(jax.random.key(0)))
        n = int(out["meta"]["plasma"])
        # Physical photon count (cf. tests/test_plasma.py).
        expected = 2e12 * 1e-3 * 0.02**3 * np.sin(np.radians(10.0) / 2) ** 2
        assert abs(n - expected) < 6 * np.sqrt(expected), (n, expected)

        it = pipe.make_iteration(keep_history=False, keep_images=True)
        out_x = jax.tree_util.tree_map(
            np.asarray, it(pipe.params, jax.random.key(1)))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out["meta"][name]), int(out_x["meta"][name]), n)
        assert out["image"]["detector"].sum() == int(out["meta"]["detector"])

    def test_plasma_toroidal_multi_iter(self):
        from xicsrt_tpu.ops.fused_trace import build_fast_run

        config = self._plasma_config(
            class_name="XicsrtOpticToroidalCrystal",
            radius_major=1.0, radius_minor=0.64, rocking_fwhm=2e-3)
        del config["optics"]["crystal"]["radius"]
        config["sources"]["plasma"]["emissivity"] = 2e13
        config["general"]["number_of_iter"] = 3
        pipe = Pipeline(config)
        run, kind = build_fast_run(pipe, interpret=True, chunk=4096)
        assert kind == "fused"
        out = jax.tree_util.tree_map(np.asarray, run(jax.random.key(0)))
        n = int(out["meta"]["plasma"])
        expected = 3 * 2e13 * 1e-3 * 0.02**3 * np.sin(
            np.radians(10.0) / 2) ** 2
        assert abs(n - expected) < 6 * np.sqrt(expected), (n, expected)
        assert int(out["meta"]["detector"]) > 0
        assert out["image"]["detector"].sum() == int(out["meta"]["detector"])
        # Cross-check the torus+plasma chain against the XLA engine.
        it = jax.jit(pipe.make_run(3))
        out_x = jax.tree_util.tree_map(
            np.asarray, it(pipe.params, jax.random.key(1)))
        _assert_binomial_close(
            int(out["meta"]["crystal"]), int(out_x["meta"]["crystal"]), n)

    def test_plasma_windowed_bundles_beyond_4096(self):
        """bundle_count > 4096: the kernel DMAs a constant-size bundle
        window per chunk (zero-count bundles compacted to the back so a
        chunk's bundle span is bounded). Photon accounting and the traced
        chain must match the XLA engine (round-3 verdict #6)."""
        from xicsrt_tpu.ops.fused_trace import build_fast_run

        config = self._plasma_config()
        src = config["sources"]["plasma"]
        src["bundle_count"] = 6000   # mean ~2.7 photons/bundle: plenty of
        src["emissivity"] = 2e13     # zero-count bundles exercise the
        src["max_bundles"] = 10000   # compaction path
        pipe = Pipeline(config)
        assert pipe.source.bundle_count == 6000
        run, kind = build_fast_run(pipe, interpret=True, chunk=4096)
        assert kind == "fused"
        out = jax.tree_util.tree_map(np.asarray, run(jax.random.key(0)))
        n = int(out["meta"]["plasma"])
        expected = 2e13 * 1e-3 * 0.02**3 * np.sin(np.radians(10.0) / 2) ** 2
        assert abs(n - expected) < 6 * np.sqrt(expected), (n, expected)

        it = pipe.make_iteration(keep_history=False, keep_images=True)
        out_x = jax.tree_util.tree_map(
            np.asarray, it(pipe.params, jax.random.key(1)))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out["meta"][name]), int(out_x["meta"][name]), n)
        assert out["image"]["detector"].sum() == int(out["meta"]["detector"])

    def test_engine_auto_routes_plasma_to_hybrid(self):
        config = self._plasma_config()
        config["general"]["engine"] = "fused"
        results = raytrace(config)
        n = results["total"]["meta"]["plasma"]["num_out"]
        expected = 2e12 * 1e-3 * 0.02**3 * np.sin(np.radians(10.0) / 2) ** 2
        assert abs(n - expected) < 6 * np.sqrt(expected), (n, expected)

    def test_trace_only_kernel_directly(self):
        """The streaming trace-only kernel (fallback path for ray-filtered
        sources / >4096 bundles) stays correct even though plasma now
        routes to the megakernel."""
        from xicsrt_tpu.ops.fused_trace import build_fused_trace_run

        pipe = Pipeline(self._plasma_config())
        run = build_fused_trace_run(pipe, interpret=True, chunk=4096)
        out = jax.tree_util.tree_map(np.asarray, run(jax.random.key(0)))
        n = int(out["meta"]["plasma"])
        expected = 2e12 * 1e-3 * 0.02**3 * np.sin(np.radians(10.0) / 2) ** 2
        assert abs(n - expected) < 6 * np.sqrt(expected), (n, expected)
        assert out["image"]["detector"].sum() == int(out["meta"]["detector"])

    def test_inkernel_plasma_statistics_vs_xla(self):
        """In-kernel bundle sampling matches the XLA engine's plasma
        photon statistics and Bragg throughput (larger stats)."""
        config = self._plasma_config(rocking_fwhm=1e-3)
        config["sources"]["plasma"]["emissivity"] = 4e14
        config["sources"]["plasma"]["temperature"] = 300.0
        config["sources"]["plasma"]["velocity"] = [0.0, 1e4, 0.0]
        from xicsrt_tpu.ops.fused_trace import build_fast_run

        pipe = Pipeline(config)
        run, kind = build_fast_run(pipe, interpret=True, chunk=4096)
        assert kind == "fused"
        out = jax.tree_util.tree_map(np.asarray, run(jax.random.key(5)))
        it = pipe.make_iteration(keep_history=False, keep_images=True)
        out_x = jax.tree_util.tree_map(
            np.asarray, it(pipe.params, jax.random.key(6)))
        n = int(out["meta"]["plasma"])
        _assert_binomial_close(n, int(out_x["meta"]["plasma"]),
                               2 * max(n, 1))
        for name in ("crystal", "detector"):
            _assert_binomial_close(
                int(out["meta"][name]), int(out_x["meta"][name]), n)
        assert int(out["meta"]["detector"]) > 50


class TestEngineRouting:
    def test_raytrace_auto_uses_fused(self, tmp_path, caplog):
        config = _spectrometer(4096, engine="fused")
        results = raytrace(config)
        assert results["total"]["meta"]["source"]["num_out"] == 4096
        img = np.asarray(results["total"]["image"]["detector"])
        assert img.sum() == results["total"]["meta"]["detector"]["num_out"]

    def test_auto_falls_back_outside_subset(self):
        # float64 is outside the fused subset -> auto = XLA engine.
        config = _spectrometer(1024, engine="auto", dtype="float64")
        results = raytrace(config)
        assert results["total"]["meta"]["source"]["num_out"] >= 0

    def test_fused_raises_outside_subset(self):
        from xicsrt_tpu.engine import build_runner

        config = _spectrometer(1024, engine="fused", dtype="float64")
        with pytest.raises(FusedUnsupported):
            build_runner(config)

    def test_fused_rejects_stale_params(self):
        """Mutating params with engine='fused' errors instead of silently
        tracing build-time geometry (round-2 verdict weak #5)."""
        import jax.numpy as jnp

        from xicsrt_tpu.engine import build_runner

        runner, pipe = build_runner(_spectrometer(2048, engine="fused"))
        out = runner(pipe.params, jax.random.key(0))  # build-time params OK
        assert int(np.asarray(out["meta"]["source"])) == 2048

        mutated = jax.tree_util.tree_map(lambda x: x, pipe.params)
        mutated["optics"]["crystal"]["crystal_spacing"] = jnp.asarray(2.5)
        with pytest.raises(ValueError, match="bakes geometry"):
            runner(mutated, jax.random.key(0))

    def test_fused_rejects_history(self):
        config = _spectrometer(1024, engine="fused", keep_history=True)
        from xicsrt_tpu.engine import build_runner

        with pytest.raises(NotImplementedError):
            build_runner(config)

    def test_keep_meta_false(self):
        pipe = Pipeline(_spectrometer(2048, keep_meta=False))
        fused = build_fused_run(pipe, chunk=2048, interpret=True)
        out = jax.tree_util.tree_map(np.asarray, fused(jax.random.key(0)))
        assert out["meta"] == {}
        assert out["image"]["detector"].shape[0] > 0
