"""Tests for aperture masks and boolean composition logic."""

import jax.numpy as jnp
import numpy as np

from xicsrt_tpu.ops.aperture import aperture_mask, normalize_aperture_spec


def _assert_match_off_boundary(m, expect, boundary_dist, tol=1e-9):
    """Compare masks except within a float-noise band of the aperture edge."""
    off = np.abs(boundary_dist) > tol
    np.testing.assert_array_equal(m[off], expect[off])


def _grid(n=101, half=0.1):
    x = np.linspace(-half, half, n)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), np.zeros(n * n)], axis=-1)
    return jnp.asarray(pts), xx.ravel(), yy.ravel()


class TestApertureShapes:
    def test_circle(self):
        pts, xs, ys = _grid()
        spec = normalize_aperture_spec({"shape": "circle", "size": [0.05]})
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))
        expect = xs**2 + ys**2 < 0.05**2
        _assert_match_off_boundary(m, expect, xs**2 + ys**2 - 0.05**2)

    def test_rectangle_with_origin(self):
        pts, xs, ys = _grid()
        spec = normalize_aperture_spec(
            {"shape": "rectangle", "size": [0.08, 0.04], "origin": [0.02, -0.01]}
        )
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))
        expect = (np.abs(xs - 0.02) < 0.04) & (np.abs(ys + 0.01) < 0.02)
        dist = np.minimum(np.abs(np.abs(xs - 0.02) - 0.04), np.abs(np.abs(ys + 0.01) - 0.02))
        _assert_match_off_boundary(m, expect, dist)

    def test_ellipse(self):
        pts, xs, ys = _grid()
        spec = normalize_aperture_spec({"shape": "ellipse", "size": [0.08, 0.04]})
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))
        expect = (xs / 0.08) ** 2 + (ys / 0.04) ** 2 < 1
        _assert_match_off_boundary(m, expect, (xs / 0.08) ** 2 + (ys / 0.04) ** 2 - 1)

    def test_triangle(self):
        pts, xs, ys = _grid()
        verts = [[0.0, 0.05], [-0.05, -0.05], [0.05, -0.05]]
        spec = normalize_aperture_spec({"shape": "triangle", "vertices": verts})
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))
        assert m[len(m) // 2]  # center inside
        assert m.sum() < len(m)  # corners outside

    def test_square(self):
        pts, xs, ys = _grid()
        spec = normalize_aperture_spec({"shape": "square", "size": [0.06]})
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))
        expect = (np.abs(xs) < 0.03) & (np.abs(ys) < 0.03)
        dist = np.minimum(np.abs(np.abs(xs) - 0.03), np.abs(np.abs(ys) - 0.03))
        _assert_match_off_boundary(m, expect, dist)


class TestApertureLogic:
    def test_annulus_and_not(self):
        pts, xs, ys = _grid()
        spec = normalize_aperture_spec(
            [
                {"shape": "circle", "size": [0.08], "logic": "and"},
                {"shape": "circle", "size": [0.04], "logic": "not"},
            ]
        )
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))
        r2 = xs**2 + ys**2
        expect = (r2 < 0.08**2) & ~(r2 < 0.04**2)
        dist = np.minimum(np.abs(r2 - 0.08**2), np.abs(r2 - 0.04**2))
        _assert_match_off_boundary(m, expect, dist)

    def test_or_revives_within_mask(self):
        pts, xs, ys = _grid()
        spec = normalize_aperture_spec(
            [
                {"shape": "circle", "size": [0.03], "logic": "and"},
                {"shape": "circle", "size": [0.03], "origin": [0.05, 0.0], "logic": "or"},
            ]
        )
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))
        r2a = xs**2 + ys**2
        r2b = (xs - 0.05) ** 2 + ys**2
        expect = (r2a < 0.03**2) | (r2b < 0.03**2)
        dist = np.minimum(np.abs(r2a - 0.03**2), np.abs(r2b - 0.03**2))
        _assert_match_off_boundary(m, expect, dist)

    def test_incoming_mask_respected(self):
        pts, xs, ys = _grid()
        incoming = jnp.asarray(xs > 0)
        spec = normalize_aperture_spec({"shape": "circle", "size": [0.05]})
        m = np.asarray(aperture_mask(pts, incoming, spec))
        assert not np.any(m[~np.asarray(incoming)])

    def test_example_02_multi_circle(self):
        """The 7-circle boolean aperture from the bundled example_02."""
        pts, xs, ys = _grid(n=201)
        spec = normalize_aperture_spec(
            [
                {"shape": "circle", "size": [0.075], "logic": "and"},
                {"shape": "circle", "size": [0.065], "origin": [-0.010, -0.01], "logic": "not"},
                {"shape": "circle", "size": [0.048], "origin": [-0.027, -0.01], "logic": "or"},
                {"shape": "circle", "size": [0.044], "origin": [-0.032, -0.015], "logic": "not"},
                {"shape": "circle", "size": [0.034], "origin": [-0.041, -0.013], "logic": "or"},
                {"shape": "circle", "size": [0.032], "origin": [-0.045, -0.018], "logic": "not"},
                {"shape": "circle", "size": [0.025], "origin": [-0.038, -0.020], "logic": "or"},
            ]
        )
        m = np.asarray(aperture_mask(pts, jnp.ones(len(xs), bool), spec))

        # Numpy oracle implementing the reference update rules directly.
        m_ref = np.ones(len(xs), dtype=bool)
        mask0 = np.ones(len(xs), dtype=bool)
        circles = [
            (0.075, 0.0, 0.0, "and"),
            (0.065, -0.010, -0.01, "not"),
            (0.048, -0.027, -0.01, "or"),
            (0.044, -0.032, -0.015, "not"),
            (0.034, -0.041, -0.013, "or"),
            (0.032, -0.045, -0.018, "not"),
            (0.025, -0.038, -0.020, "or"),
        ]
        for r, ox, oy, logic in circles:
            inside = ((xs - ox) ** 2 + (ys - oy) ** 2 < r**2) & mask0
            if logic == "and":
                m_ref[mask0] &= inside[mask0]
            elif logic == "not":
                m_ref[mask0] &= ~inside[mask0]
            elif logic == "or":
                m_ref[mask0] |= inside[mask0]
        dist = np.full(len(xs), np.inf)
        for r, ox, oy, logic in circles:
            dist = np.minimum(dist, np.abs((xs - ox) ** 2 + (ys - oy) ** 2 - r**2))
        _assert_match_off_boundary(m, m_ref, dist)
