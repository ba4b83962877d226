"""End-to-end engine tests: geometry, statistics, reproducibility.

Modeled on the reference's integrated-test strategy (SURVEY.md section 4):
statistical validation with Poisson tolerances, geometry checks against
analytic expectations, and determinism under fixed seeds.
"""

import numpy as np
import pytest

import xicsrt_tpu


def _example_00(intensity=1e3, num_iter=2, **general):
    g = {"number_of_iter": num_iter, "random_seed": 0, "print_results": False}
    g.update(general)
    return {
        "general": g,
        "sources": {
            "source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": intensity,
                "wavelength": 3.9492,
                "spread": np.radians(5.0),
            }
        },
        "optics": {
            "detector": {
                "class_name": "XicsrtOpticDetector",
                "origin": [0.0, 0.0, 1.0],
                "zaxis": [0.0, 0.0, -1.0],
                "xsize": 0.2,
                "ysize": 0.2,
            }
        },
    }


def _example_01(intensity=1e4, num_iter=2, **general):
    g = {"number_of_iter": num_iter, "random_seed": 0, "print_results": False}
    g.update(general)
    return {
        "general": g,
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


class TestExample00:
    def test_all_rays_hit_detector(self):
        # 5-degree cone from a point source 1 m away: the full cone radius is
        # tan(5 deg) ~ 0.0875 < 0.1 detector half-width -> all rays detected.
        results = xicsrt_tpu.raytrace(_example_00())
        meta = results["total"]["meta"]
        assert meta["source"]["num_out"] == 2000
        assert meta["detector"]["num_out"] == 2000

    def test_image_total_and_extent(self):
        results = xicsrt_tpu.raytrace(_example_00())
        img = results["total"]["image"]["detector"]
        assert img.shape == (100, 100)
        assert img.sum() == 2000
        # Hits are confined to the cone footprint: radius 0.0875 m = 43.7 px.
        ix, iy = np.nonzero(img)
        r = np.sqrt((ix - 49.5) ** 2 + (iy - 49.5) ** 2)
        assert r.max() <= 45.0

    def test_reproducible_with_seed(self):
        r1 = xicsrt_tpu.raytrace(_example_00())
        r2 = xicsrt_tpu.raytrace(_example_00())
        np.testing.assert_array_equal(
            r1["total"]["image"]["detector"], r2["total"]["image"]["detector"]
        )

    def test_seed_changes_rays(self):
        r1 = xicsrt_tpu.raytrace(_example_00())
        r2 = xicsrt_tpu.raytrace(_example_00(random_seed=1))
        assert not np.array_equal(
            r1["total"]["image"]["detector"], r2["total"]["image"]["detector"]
        )

    def test_history_structure(self):
        results = xicsrt_tpu.raytrace(_example_00())
        found = results["found"]["history"]
        assert set(found.keys()) == {"source", "detector"}
        n_found = results["total"]["meta"]["detector"]["num_out"]
        assert found["detector"]["origin"].shape == (n_found, 3)
        # Found rays terminate on the detector plane z=1.
        np.testing.assert_allclose(found["detector"]["origin"][:, 2], 1.0, atol=1e-5)

    def test_keep_history_off(self):
        results = xicsrt_tpu.raytrace(_example_00(keep_history=False))
        assert results["found"]["history"] == {}
        assert results["total"]["image"]["detector"].sum() == 2000

    def test_multiple_runs_combine(self):
        results = xicsrt_tpu.raytrace(_example_00(number_of_runs=3))
        assert results["total"]["meta"]["source"]["num_out"] == 6000
        assert results["total"]["image"]["detector"].sum() == 6000

    def test_keep_meta_off(self):
        """keep_meta=False drops per-element counters (reference gate,
        xicsrt_raytrace.py:187-201) while images still accumulate."""
        results = xicsrt_tpu.raytrace(
            _example_00(keep_meta=False, keep_history=False)
        )
        assert results["total"]["meta"] == {}
        assert results["total"]["image"]["detector"].sum() == 2000

    def test_block_iterations_off_matches_blocked(self):
        """block_iterations=False (one jitted iteration, host loop) produces
        exactly the blocked lax.scan result under the same seed."""
        blocked = xicsrt_tpu.raytrace(_example_00(num_iter=3))
        unblocked = xicsrt_tpu.raytrace(
            _example_00(num_iter=3, block_iterations=False,
                        keep_history=False)
        )
        np.testing.assert_array_equal(
            blocked["total"]["image"]["detector"],
            unblocked["total"]["image"]["detector"],
        )
        assert (
            unblocked["total"]["meta"]["detector"]["num_out"]
            == blocked["total"]["meta"]["detector"]["num_out"]
        )

    def test_found_lost_meta_counts(self):
        """found/lost sections carry per-element num_out for the compacted
        ray sets (extends the reference's empty found/lost meta)."""
        config = _example_00()
        config["optics"]["detector"]["xsize"] = 0.12  # vignetted
        config["optics"]["detector"]["ysize"] = 0.12
        results = xicsrt_tpu.raytrace(config)
        n_found = results["total"]["meta"]["detector"]["num_out"]
        assert results["found"]["meta"]["detector"]["num_out"] == n_found
        assert results["found"]["meta"]["source"]["num_out"] == n_found
        n_lost = results["lost"]["meta"]["source"]["num_out"]
        assert n_lost == 2000 - n_found
        assert results["lost"]["meta"]["detector"]["num_out"] == 0


class TestExample01Bragg:
    def test_efficiency_matches_reference(self):
        """Bragg-reflection efficiency matches the CPU reference measurement.

        Reference (PrincetonUniversity/xicsrt v0.8.13, same geometry,
        1e6 rays): efficiency 4.187e-2 +/- 2.0e-4. Allow 5 sigma.
        """
        results = xicsrt_tpu.raytrace(_example_01(intensity=2e4, num_iter=5))
        meta = results["total"]["meta"]
        n_gen = meta["source"]["num_out"]
        n_det = meta["detector"]["num_out"]
        eff = n_det / n_gen
        ref_eff = 4.187e-2
        sigma = np.sqrt(ref_eff * n_gen) / n_gen
        assert abs(eff - ref_eff) < 5 * sigma

    def test_bragg_line_is_narrow_on_detector(self):
        # Monochromatic Bragg reflection from a spherical crystal focuses to
        # a narrow line: the image must concentrate in few pixels per row.
        results = xicsrt_tpu.raytrace(_example_01())
        img = results["total"]["image"]["detector"]
        assert img.sum() > 0
        occupied = (img > 0).sum()
        assert occupied < img.size * 0.01

    def test_check_bragg_false_acts_as_mirror(self):
        config = _example_01()
        config["optics"]["crystal"]["check_bragg"] = False
        results = xicsrt_tpu.raytrace(config)
        meta = results["total"]["meta"]
        # Without the rocking-curve filter every ray hitting the crystal
        # reflects; with this geometry most land on the detector.
        assert meta["crystal"]["num_out"] > 0.9e4
        assert meta["detector"]["num_out"] > 0.5 * meta["crystal"]["num_out"]

    def test_weight_mode_matches_mc_expectation(self):
        mc = xicsrt_tpu.raytrace(_example_01(intensity=2e4, num_iter=5))
        wt = xicsrt_tpu.raytrace(
            _example_01(intensity=2e4, num_iter=5, interact_mode="weight")
        )
        img_mc = mc["total"]["image"]["detector"]
        img_wt = wt["total"]["image"]["detector"]
        # Weighted image integrates to the expected photon count.
        n = img_mc.sum()
        assert abs(img_wt.sum() - n) < 5 * np.sqrt(n)


class TestSources:
    def test_poisson_intensity(self):
        config = _example_00()
        config["sources"]["source"]["use_poisson"] = True
        config["sources"]["source"]["intensity"] = 500.0
        counts = []
        for seed in range(5):
            config["general"]["random_seed"] = seed
            config["general"]["number_of_iter"] = 1
            r = xicsrt_tpu.raytrace(config)
            counts.append(r["total"]["meta"]["source"]["num_out"])
        counts = np.array(counts)
        assert counts.std() > 0  # actually random
        assert np.all(np.abs(counts - 500) < 6 * np.sqrt(500))

    def test_focused_source_hits_target_window(self):
        config = {
            "general": {"number_of_iter": 1, "random_seed": 0, "print_results": False},
            "sources": {
                "source": {
                    "class_name": "XicsrtSourceFocused",
                    "intensity": 2000,
                    "wavelength": 1.0,
                    "spread": np.radians(0.5),
                    "xsize": 0.2,
                    "ysize": 0.2,
                    "zsize": 0.2,
                    "target": [0.0, 0.0, 1.0],
                }
            },
            "optics": {
                "detector": {
                    "class_name": "XicsrtOpticDetector",
                    "origin": [0.0, 0.0, 1.0],
                    "zaxis": [0.0, 0.0, -1.0],
                    "xsize": 0.1,
                    "ysize": 0.1,
                }
            },
        }
        results = xicsrt_tpu.raytrace(config)
        # Every emission cone is aimed at the detector center; with a narrow
        # spread from <=1.2 m away, the spot radius is ~tan(0.5deg)*1.2+0 ~ 1 cm.
        meta = results["total"]["meta"]
        assert meta["detector"]["num_out"] == meta["source"]["num_out"]

    def test_uniform_wavelength_range(self):
        config = _example_00()
        config["sources"]["source"]["wavelength_dist"] = "uniform"
        config["sources"]["source"]["wavelength_range"] = [1.0, 2.0]
        results = xicsrt_tpu.raytrace(config)
        w = results["found"]["history"]["source"]["wavelength"]
        assert w.min() >= 1.0 and w.max() <= 2.0
        assert w.std() > 0.2  # roughly uniform, not clumped


class TestFilters:
    def test_sightline_filter_masks_rays(self):
        config = _example_00()
        config["sources"]["source"]["xsize"] = 0.5
        config["sources"]["source"]["ysize"] = 0.5
        config["sources"]["source"]["filters"] = ["sight"]
        config["filters"] = {
            "sight": {
                "class_name": "XicsrtBundleFilterSightline",
                "origin": [0.0, 0.0, 0.0],
                "zaxis": [0.0, 0.0, 1.0],
                "radius": 0.05,
            }
        }
        results = xicsrt_tpu.raytrace(config)
        src = results["found"]["history"]["source"]
        r = np.sqrt(src["origin"][:, 0] ** 2 + src["origin"][:, 1] ** 2)
        assert np.all(r <= 0.05 + 1e-9)
        assert results["total"]["meta"]["source"]["num_out"] < 2000


class TestConfigSystem:
    def test_strict_config_check(self):
        config = _example_00()
        config["sources"]["source"]["not_an_option"] = 1
        with pytest.raises(KeyError):
            xicsrt_tpu.raytrace(config)

    def test_non_strict_config(self):
        config = _example_00(strict_config_check=False)
        config["sources"]["source"]["not_an_option"] = 1
        results = xicsrt_tpu.raytrace(config)
        assert results["total"]["meta"]["source"]["num_out"] == 2000

    def test_unknown_class_name(self):
        config = _example_00()
        config["optics"]["detector"]["class_name"] = "NoSuchOptic"
        with pytest.raises(KeyError):
            xicsrt_tpu.raytrace(config)

    def test_get_element(self):
        elem = xicsrt_tpu.get_element(_example_00(), "detector")
        assert elem.name == "detector"
        assert elem.image_shape == (100, 100)
