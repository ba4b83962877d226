"""Statistical parity against the CPU reference implementation.

Golden data in tests/golden/ was produced by running
PrincetonUniversity/xicsrt v0.8.13 (the reference at /root/reference) on
the example_01 Bragg spectrometer geometry with 1e6 rays, pixel_size 0.004
(see the generation script in the repo history). The two codes use
different RNGs, so comparisons are distributional with Poisson tolerances:

- total efficiency (detected/generated) within 5 combined sigma;
- the detector image, coarsened to superpixels, matches in distribution
  (chi-square per superpixel within tolerance);
- the spectral line position/width along the dispersion axis agree.
"""

import os

import numpy as np
import pytest

import xicsrt_tpu

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "example01_reference_image.npz")


def _config(intensity=1e5, num_iter=10):
    return {
        "general": {
            "number_of_iter": num_iter,
            "random_seed": 7,
            "print_results": False,
            "keep_history": False,
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


@pytest.fixture(scope="module")
def golden():
    data = np.load(GOLDEN)
    return {k: data[k] for k in data.files}


@pytest.fixture(scope="module")
def ours():
    return xicsrt_tpu.raytrace(_config())


class TestReferenceParity:
    def test_efficiency(self, golden, ours):
        n_gen = ours["total"]["meta"]["source"]["num_out"]
        n_det = ours["total"]["meta"]["detector"]["num_out"]
        eff_ours = n_det / n_gen
        eff_ref = float(golden["meta_detector"]) / float(golden["n_generated"])
        sigma = np.sqrt(eff_ref / n_gen + eff_ref / golden["n_generated"])
        assert abs(eff_ours - eff_ref) < 5 * sigma

    def test_crystal_acceptance(self, golden, ours):
        n_gen = ours["total"]["meta"]["source"]["num_out"]
        acc_ours = ours["total"]["meta"]["crystal"]["num_out"] / n_gen
        acc_ref = float(golden["meta_crystal"]) / float(golden["n_generated"])
        sigma = np.sqrt(acc_ref / n_gen + acc_ref / golden["n_generated"])
        assert abs(acc_ours - acc_ref) < 5 * sigma

    def test_image_distribution_superpixels(self, golden, ours):
        """Coarse-grained image chi-square against the reference."""
        ref = golden["image"].astype(np.float64)
        img = ours["total"]["image"]["detector"].astype(np.float64)
        assert img.shape == ref.shape
        # 10x10 superpixels.
        sp = lambda a: a.reshape(10, 10, 5, 10).sum(axis=(1, 3))
        R = sp(ref)
        O = sp(img)
        # Scale to common total.
        O = O * (R.sum() / O.sum())
        keep = (R + O) > 50  # superpixels with statistics
        chi2 = ((O[keep] - R[keep]) ** 2 / (R[keep] + O[keep])).sum()
        ndof = keep.sum()
        # chi2/ndof ~ 1 when distributions agree; allow generous slack.
        assert chi2 / ndof < 3.0, f"chi2/ndof = {chi2 / ndof:.2f}"

    def test_line_position_and_width(self, golden, ours):
        """Spectral line centroid and width along the dispersion (y) axis."""
        ref = golden["image"].astype(np.float64).sum(axis=0)
        img = ours["total"]["image"]["detector"].astype(np.float64).sum(axis=0)
        ys = np.arange(len(ref))

        def moments(p):
            p = p / p.sum()
            mu = (p * ys).sum()
            sd = np.sqrt((p * (ys - mu) ** 2).sum())
            return mu, sd

        mu_r, sd_r = moments(ref)
        mu_o, sd_o = moments(img)
        # Centroid within a fraction of a pixel; width within 5%.
        assert abs(mu_o - mu_r) < 0.5
        assert abs(sd_o - sd_r) < 0.05 * sd_r
