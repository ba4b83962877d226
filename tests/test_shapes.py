"""Shape geometry tests: exact intersections, planar limits, analytic-vs-mesh
cross-validation, and the all-optics smoke matrix.

Mirrors the reference's integrated_test_01 (all-optics smoke + analytic/mesh
comparison) and integrated_test_02 (curved shapes with huge radii converge to
the planar result).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import xicsrt_tpu  # noqa: F401  (registers elements)
from xicsrt_tpu.dispatch import instantiate
from xicsrt_tpu.rays import Rays


def _make_rays(origins, directions, wavelength=1.0):
    origins = jnp.asarray(origins, dtype=jnp.float64)
    directions = jnp.asarray(directions, dtype=jnp.float64)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    n = origins.shape[0]
    return Rays(
        origin=origins,
        direction=directions,
        wavelength=jnp.full((n,), wavelength, dtype=jnp.float64),
        weight=jnp.ones((n,), dtype=jnp.float64),
        mask=jnp.ones((n,), dtype=bool),
    )


def _build(class_name, **config):
    config.setdefault("origin", [0.0, 0.0, 1.0])
    config.setdefault("zaxis", [0.0, 0.0, -1.0])
    general = {"dtype": "float64", "strict_config_check": True}
    return instantiate("optic", {"class_name": class_name, **config}, general)


def _intersect(optic, rays):
    fn = optic.make_intersect()
    params = optic.build_params()
    dist, norm, mask = fn(params, rays)
    return np.asarray(dist), np.asarray(norm), np.asarray(mask)


def _parallel_rays(nx=11, half=0.05):
    x = np.linspace(-half, half, nx)
    origins = np.stack([x, np.zeros(nx), np.zeros(nx)], axis=-1)
    directions = np.tile([0.0, 0.0, 1.0], (nx, 1))
    return _make_rays(origins, directions)


class TestAnalyticShapes:
    def test_plane_distance(self):
        optic = _build("XicsrtOpticDetector", xsize=1.0, ysize=1.0)
        rays = _parallel_rays()
        dist, norm, mask = _intersect(optic, rays)
        assert mask.all()
        np.testing.assert_allclose(dist, 1.0, atol=1e-12)
        np.testing.assert_allclose(norm[:, 2], -1.0, atol=1e-12)

    def test_plane_rejects_backward(self):
        optic = _build("XicsrtOpticDetector", xsize=1.0, ysize=1.0)
        rays = _make_rays([[0.0, 0.0, 2.0]], [[0.0, 0.0, 1.0]])  # moving away
        _, _, mask = _intersect(optic, rays)
        assert not mask.any()

    def test_sphere_sagitta_concave(self):
        # Concave R=1 sphere at (0,0,1) facing -z: center at the origin.
        optic = _build(
            "XicsrtOpticSphericalMirror", radius=1.0, xsize=0.2, ysize=0.2
        )
        rays = _parallel_rays()
        dist, norm, mask = _intersect(optic, rays)
        assert mask.all()
        x = np.asarray(rays.origin)[:, 0]
        expected = np.sqrt(1.0 - x**2)  # |P - C| = R with C at origin
        np.testing.assert_allclose(dist, expected, atol=1e-12)
        # Normal points back towards the center (the source side).
        xloc = np.asarray(rays.origin) + np.asarray(rays.direction) * dist[:, None]
        np.testing.assert_allclose(
            norm, -xloc / np.linalg.norm(xloc, axis=1, keepdims=True), atol=1e-9
        )

    def test_sphere_convex_near_root(self):
        optic = _build(
            "XicsrtOpticSphericalMirror", radius=1.0, convex=True, xsize=0.2, ysize=0.2
        )
        rays = _parallel_rays(nx=1, half=0.0)
        dist, _, mask = _intersect(optic, rays)
        assert mask.all()
        # Convex: center at (0,0,2); near intersection at z=1.
        np.testing.assert_allclose(dist, 1.0, atol=1e-12)

    def test_cylinder_matches_sphere_on_axis_plane(self):
        # Cylinder axis along local x: rays offset in y see circular curvature.
        cyl = _build("XicsrtOpticCylindricalMirror", radius=1.0, xsize=0.2, ysize=0.2)
        sph = _build("XicsrtOpticSphericalMirror", radius=1.0, xsize=0.2, ysize=0.2)
        y = np.linspace(-0.05, 0.05, 11)
        origins = np.stack([np.zeros(11), y, np.zeros(11)], axis=-1)
        rays = _make_rays(origins, np.tile([0, 0, 1.0], (11, 1)))
        d_cyl, _, m_cyl = _intersect(cyl, rays)
        d_sph, _, m_sph = _intersect(sph, rays)
        assert m_cyl.all() and m_sph.all()
        np.testing.assert_allclose(d_cyl, d_sph, atol=1e-12)

    def test_cylinder_flat_along_axis(self):
        cyl = _build("XicsrtOpticCylindricalMirror", radius=1.0, xsize=0.2, ysize=0.2)
        rays = _parallel_rays()  # offsets along x = cylinder axis
        dist, _, mask = _intersect(cyl, rays)
        assert mask.all()
        np.testing.assert_allclose(dist, 1.0, atol=1e-12)

    def test_torus_center_point(self):
        optic = _build(
            "XicsrtOpticToroidalMirror",
            radius_major=1.0,
            radius_minor=0.2,
            xsize=0.1,
            ysize=0.05,
        )
        rays = _parallel_rays(nx=1, half=0.0)
        dist, norm, mask = _intersect(optic, rays)
        assert mask.all()
        np.testing.assert_allclose(dist, 1.0, atol=1e-9)
        # Normal orientation follows the reference's torus convention
        # (outward from the tube center, _ShapeTorus.py:211-214); only the
        # axis matters for reflection physics.
        np.testing.assert_allclose(np.abs(norm[0, 2]), 1.0, atol=1e-9)

    def test_torus_major_curvature_matches_sphere(self):
        # In the local x direction the torus has radius_major curvature.
        optic = _build(
            "XicsrtOpticToroidalMirror",
            radius_major=1.0,
            radius_minor=0.2,
            xsize=0.1,
            ysize=0.05,
        )
        sph = _build("XicsrtOpticSphericalMirror", radius=1.0, xsize=0.1, ysize=0.05)
        rays = _parallel_rays(nx=9, half=0.04)
        d_tor, _, m_tor = _intersect(optic, rays)
        d_sph, _, m_sph = _intersect(sph, rays)
        assert m_tor.all() and m_sph.all()
        np.testing.assert_allclose(d_tor, d_sph, atol=1e-9)

    def test_torus_minor_curvature_matches_sphere(self):
        optic = _build(
            "XicsrtOpticToroidalMirror",
            radius_major=1.0,
            radius_minor=0.2,
            xsize=0.1,
            ysize=0.05,
        )
        sph = _build("XicsrtOpticSphericalMirror", radius=0.2, xsize=0.1, ysize=0.05)
        y = np.linspace(-0.03, 0.03, 9)
        origins = np.stack([np.zeros(9), y, np.zeros(9)], axis=-1)
        rays = _make_rays(origins, np.tile([0, 0, 1.0], (9, 1)))
        d_tor, _, m_tor = _intersect(optic, rays)
        d_sph, _, m_sph = _intersect(sph, rays)
        assert m_tor.all() and m_sph.all()
        np.testing.assert_allclose(d_tor, d_sph, atol=1e-9)


class TestPlanarLimit:
    """integrated_test_02: huge radii converge to the planar result."""

    @pytest.mark.parametrize(
        "class_name,extra",
        [
            ("XicsrtOpticSphericalMirror", {"radius": 1e5}),
            ("XicsrtOpticCylindricalMirror", {"radius": 1e5}),
            (
                "XicsrtOpticToroidalMirror",
                {"radius_major": 1e5, "radius_minor": 1e4},
            ),
        ],
    )
    def test_converges_to_plane(self, class_name, extra):
        plane = _build("XicsrtOpticPlanarMirror", xsize=0.2, ysize=0.2)
        curved = _build(class_name, xsize=0.2, ysize=0.2, **extra)
        x = np.linspace(-0.05, 0.05, 7)
        origins = np.stack([x, x[::-1] * 0.5, np.zeros(7)], axis=-1)
        rays = _make_rays(origins, np.tile([0.01, -0.02, 1.0], (7, 1)))
        d_plane, n_plane, m_plane = _intersect(plane, rays)
        d_curved, n_curved, m_curved = _intersect(curved, rays)
        assert m_plane.all() and m_curved.all()
        np.testing.assert_allclose(d_curved, d_plane, atol=1e-6)
        np.testing.assert_allclose(
            np.abs(np.sum(n_curved * n_plane, axis=1)), 1.0, atol=1e-6
        )


class TestMeshRefine:
    """Grid-pruned refine path == dense all-faces path, exactly.

    The reference's KD-tree refinement loses edge rays (``_ShapeMesh.py:
    158-162``); the grid + coarse-hit + mid-plane-fallback design must not.
    """

    @pytest.mark.parametrize(
        "class_name,extra",
        [
            ("XicsrtOpticMeshSphericalCrystal", {"radius": 1.0}),
            ("XicsrtOpticMeshCylindricalCrystal", {"radius": 1.0}),
            (
                "XicsrtOpticMeshToroidalCrystal",
                {"radius_major": 1.0, "radius_minor": 0.2},
            ),
        ],
    )
    def test_refine_matches_dense(self, class_name, extra):
        common = dict(
            origin=[0.0, 0.0, 0.8],
            zaxis=[0.0, 0.3, -1.0],
            xsize=0.2,
            ysize=0.2,
            mesh_size=(31, 31),
            check_bragg=False,
            crystal_spacing=2.45676,
            # Block smaller than the ray count to exercise _block_map padding.
            mesh_ray_block=1000,
            **extra,
        )
        refine = _build(class_name, mesh_refine=True, **common)
        dense = _build(class_name, mesh_refine=False, **common)
        assert refine.param["mesh_refine"] and not dense.param["mesh_refine"]

        rng = np.random.default_rng(7)
        n = 4096
        origins = rng.normal(0.0, 0.02, (n, 3))
        directions = np.array([0.0, 0.24, 0.8]) - origins
        directions += rng.normal(0.0, 0.12, (n, 3))  # oblique spread
        rays = _make_rays(origins, directions)

        d_r, n_r, m_r = _intersect(refine, rays)
        d_d, n_d, m_d = _intersect(dense, rays)
        assert m_r.sum() > 100  # the scenario actually hits the optic
        np.testing.assert_array_equal(m_r, m_d)
        both = m_r & m_d
        np.testing.assert_allclose(d_r[both], d_d[both], atol=1e-9)
        np.testing.assert_allclose(n_r[both], n_d[both], atol=1e-9)


class TestMeshVsAnalytic:
    """integrated_test_01 cross-validation: mesh == analytic within facet
    error."""

    def test_mesh_sphere(self):
        analytic = _build(
            "XicsrtOpticSphericalMirror", radius=1.0, xsize=0.2, ysize=0.2
        )
        mesh = _build(
            "XicsrtOpticMeshSphericalCrystal",
            radius=1.0,
            xsize=0.2,
            ysize=0.2,
            mesh_size=(41, 41),
            check_bragg=False,
            crystal_spacing=2.45676,
        )
        rays = _parallel_rays(nx=21, half=0.08)
        d_a, n_a, m_a = _intersect(analytic, rays)
        d_m, n_m, m_m = _intersect(mesh, rays)
        assert m_a.all() and m_m.all()
        # Facet sagitta error ~ (grid spacing)^2 / (8 R) ~ 3e-6.
        np.testing.assert_allclose(d_m, d_a, atol=2e-5)
        # Interpolated normals agree to first order.
        assert np.all(np.abs(np.sum(n_m * n_a, axis=1)) > 1 - 1e-4)

    def test_mesh_cylinder(self):
        analytic = _build(
            "XicsrtOpticCylindricalMirror", radius=1.0, xsize=0.2, ysize=0.2
        )
        mesh = _build(
            "XicsrtOpticMeshCylindricalCrystal",
            radius=1.0,
            xsize=0.2,
            ysize=0.2,
            mesh_size=(41, 41),
            check_bragg=False,
            crystal_spacing=2.45676,
        )
        y = np.linspace(-0.08, 0.08, 21)
        origins = np.stack([y * 0.3, y, np.zeros(21)], axis=-1)
        rays = _make_rays(origins, np.tile([0, 0, 1.0], (21, 1)))
        d_a, _, m_a = _intersect(analytic, rays)
        d_m, _, m_m = _intersect(mesh, rays)
        assert m_a.all() and m_m.all()
        np.testing.assert_allclose(d_m, d_a, atol=2e-5)

    def test_mesh_torus(self):
        analytic = _build(
            "XicsrtOpticToroidalMirror",
            radius_major=1.0,
            radius_minor=0.2,
            xsize=0.1,
            ysize=0.05,
        )
        mesh = _build(
            "XicsrtOpticMeshToroidalCrystal",
            radius_major=1.0,
            radius_minor=0.2,
            xsize=0.1,
            ysize=0.05,
            mesh_size=(41, 41),
            check_bragg=False,
            crystal_spacing=2.45676,
        )
        x = np.linspace(-0.04, 0.04, 15)
        origins = np.stack([x, x[::-1] * 0.4, np.zeros(15)], axis=-1)
        rays = _make_rays(origins, np.tile([0, 0, 1.0], (15, 1)))
        d_a, _, m_a = _intersect(analytic, rays)
        d_m, _, m_m = _intersect(mesh, rays)
        assert m_a.all() and m_m.all()
        np.testing.assert_allclose(d_m, d_a, atol=2e-5)

    def test_mesh_torus_fd_normals(self):
        mesh = _build(
            "XicsrtOpticMeshToroidalCrystal",
            radius_major=1.0,
            radius_minor=0.2,
            xsize=0.1,
            ysize=0.05,
            mesh_size=(41, 41),
            normal_method="fd",
            check_bragg=False,
            crystal_spacing=2.45676,
        )
        analytic = _build(
            "XicsrtOpticToroidalMirror",
            radius_major=1.0,
            radius_minor=0.2,
            xsize=0.1,
            ysize=0.05,
        )
        rays = _parallel_rays(nx=9, half=0.03)
        _, n_m, m_m = _intersect(mesh, rays)
        _, n_a, m_a = _intersect(analytic, rays)
        assert m_m.all()
        assert np.all(np.abs(np.sum(n_m * n_a, axis=1)) > 1 - 1e-3)


# ---------------------------------------------------------------------------
# All-optics smoke matrix (integrated_test_01 pattern): every registered
# optic runs end-to-end in a shared spectrometer-like geometry.
# ---------------------------------------------------------------------------

_SMOKE_EXTRAS = {
    "XicsrtOpticDetector": {},
    "XicsrtOpticAperture": {"aperture": [{"shape": "circle", "size": [0.2]}]},
    "XicsrtOpticPlanarMirror": {},
    "XicsrtOpticPlanarCrystal": {"crystal_spacing": 2.45676, "check_bragg": False},
    "XicsrtOpticPlanarMosaicCrystal": {
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
    "XicsrtOpticSphericalMirror": {"radius": 1.0},
    "XicsrtOpticSphericalCrystal": {
        "radius": 1.0,
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
    "XicsrtOpticSphericalMosaicCrystal": {
        "radius": 1.0,
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
    "XicsrtOpticCylindricalMirror": {"radius": 1.0},
    "XicsrtOpticCylindricalCrystal": {
        "radius": 1.0,
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
    "XicsrtOpticToroidalMirror": {"radius_major": 1.0, "radius_minor": 0.2},
    "XicsrtOpticToroidalCrystal": {
        "radius_major": 1.0,
        "radius_minor": 0.2,
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
    "XicsrtOpticMeshSphericalCrystal": {
        "radius": 1.0,
        "mesh_size": (21, 21),
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
    "XicsrtOpticMeshCylindricalCrystal": {
        "radius": 1.0,
        "mesh_size": (21, 21),
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
    "XicsrtOpticMeshToroidalCrystal": {
        "radius_major": 1.0,
        "radius_minor": 0.2,
        "mesh_size": (21, 21),
        "crystal_spacing": 2.45676,
        "check_bragg": False,
    },
}


@pytest.mark.parametrize("class_name", sorted(_SMOKE_EXTRAS.keys()))
def test_optic_smoke(class_name):
    """Every optic traces end-to-end without error and passes rays."""
    config = {
        "general": {"number_of_iter": 1, "random_seed": 0, "print_results": False},
        "sources": {
            "source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": 2000,
                "wavelength": 3.9492,
                "spread": np.radians(3.0),
            }
        },
        "optics": {
            "optic": {
                "class_name": class_name,
                "origin": [0.0, 0.0, 1.0],
                "zaxis": [0.0, 0.17364818, -0.98480775],  # 10 deg tilt
                "xsize": 0.3,
                "ysize": 0.3,
                **_SMOKE_EXTRAS[class_name],
            },
            "detector": {
                "class_name": "XicsrtOpticDetector",
                "origin": [0.0, 0.35, 0.0],
                "zaxis": [0.0, -0.5, 0.5],
                "xsize": 2.0,
                "ysize": 2.0,
            },
        },
    }
    results = xicsrt_tpu.raytrace(config)
    meta = results["total"]["meta"]
    assert meta["optic"]["num_out"] > 0, f"{class_name}: no rays passed the optic"
    # Histories must be finite for alive rays.
    hist = results["found"]["history"]
    if hist:
        for name in ("optic",):
            alive = hist[name]["mask"]
            assert np.all(np.isfinite(hist[name]["origin"][alive]))


def test_user_mesh_optic_smoke():
    """User-supplied mesh data (MeshMirror) in global coordinates."""
    # A flat-ish mesh at z=1 tilted like the other smoke optics.
    n = 15
    x = np.linspace(-0.15, 0.15, n)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), np.full(n * n, 1.0)], axis=-1)
    from xicsrt_tpu.optics.mesh_shapes import grid_faces

    faces = grid_faces(n, n)
    config = {
        "general": {"number_of_iter": 1, "random_seed": 0, "print_results": False},
        "sources": {
            "source": {
                "class_name": "XicsrtSourceDirected",
                "intensity": 500,
                "wavelength": 3.9492,
                "spread": np.radians(2.0),
            }
        },
        "optics": {
            "optic": {
                "class_name": "XicsrtOpticMeshMirror",
                "origin": [0.0, 0.0, 1.0],
                "zaxis": [0.0, 0.0, -1.0],
                "mesh_points": pts,
                "mesh_faces": faces,
                "check_size": False,
            },
        },
    }
    results = xicsrt_tpu.raytrace(config)
    assert results["total"]["meta"]["optic"]["num_out"] > 400
