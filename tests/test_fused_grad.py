"""Fused forward+backward kernels (ops/fused_grad.py).

Validation strategy: the kernels and the CPU replica share the SAME
pure-jnp forward (`_sample_source` + `_trace_fwd`), so

1. the hand-written adjoint (`_trace_bwd` + image seeds) is checked
   against ``jax.grad`` of the replica loss on identical uniforms —
   EXACT (same arithmetic), not statistical;
2. the interpreted kernels must reproduce the replica's images and
   gradient vector on the same uniforms;
3. gradients must also agree with the XLA engine's ``jax.grad`` at the
   statistical level (different samplers -> MC tolerance) — covered by
   the scalar check against the weight-mode XLA gradient.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xicsrt_tpu.engine import Pipeline
from xicsrt_tpu.ops import fused_grad as FG


def _config(intensity, y0=-3e-4, fwhm=1e-3):
    return {
        "general": {
            "number_of_iter": 1,
            "random_seed": 0,
            "print_results": False,
            "keep_history": False,
            "interact_mode": "weight",
            "image_mode": "bilinear",
        },
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
                "origin": [0.0, y0, 0.80374151],
                "zaxis": [0.0, 0.59497864, -0.80374151],
                "xsize": 0.2,
                "ysize": 0.2,
                "radius": 1.0,
                "crystal_spacing": 2.45676,
                "rocking_type": "gaussian",
                "rocking_fwhm": fwhm,
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


def _build(intensity=1792, chunk=1024):
    pipeline = Pipeline(_config(intensity))
    forward, vjp, pack, spec = FG.build_fused_diff(
        pipeline, chunk=chunk, interpret=True, rng="input"
    )
    return pipeline, forward, vjp, pack, spec


def _sample_any(spec, draw, sub, P, dtype):
    """Dispatch to the plasma or generic sampler (kernel draw order)."""
    src = spec["src"]
    if src.get("kind") == "plasma":
        src_base = len(spec["optics"]) * FG.SLOTS_PER_OPTIC
        return FG._sample_plasma(src, draw, sub, P, src_base, f32=dtype)
    out = FG._sample_source(src, draw, sub, f32=dtype)
    return out + (None, None)


def _replica_loss(spec, pvec, uniforms, gs, dtype=jnp.float32):
    """Pure-jnp replica of loss = sum_i g_i * image_i, sharing the
    kernel's forward functions. ``uniforms``: (n_chunks, n_draws, 8, sub);
    ``gs``: {name: [nx, ny]} cotangent images."""
    optics, src = spec["optics"], spec["src"]
    chunk = spec["chunk"]
    sub = chunk // 8
    n_total = spec["n_total"]
    loss = 0.0
    for c in range(spec["n_chunks"]):
        slot = [0]

        def draw():
            k = slot[0]
            slot[0] += 1
            return uniforms[c, k].astype(dtype)

        rows = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 1)
        alive = (c * chunk + rows * sub + cols) < n_total
        P = jnp.asarray(pvec, dtype)
        px, py, pz, dx, dy, dz, lam, w0v, _aux = _sample_any(
            spec, draw, sub, P, dtype)
        _, images_data, _ = FG._trace_fwd(
            optics, src, P,
            px, py, pz, dx, dy, dz, alive, lam=lam, need_saved=False,
            tables=spec.get("tables"), w0=w0v, draw=draw,
        )
        for (oi, w_img, fx, fy) in images_data:
            im = optics[oi]["image"]
            g = jnp.asarray(gs[optics[oi]["name"]], dtype)
            xs = jnp.arange(im["nx"], dtype=dtype)
            ys = jnp.arange(im["ny"], dtype=dtype)
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(
                fx.reshape(-1)[:, None] - xs[None, :]))
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(
                fy.reshape(-1)[:, None] - ys[None, :]))
            img = jnp.einsum("ri,rj,r->ij", tx, ty, w_img.reshape(-1))
            loss = loss + jnp.sum(img * g)
    return loss


@pytest.fixture(scope="module")
def built():
    pipeline, forward, vjp, pack, spec = _build()
    pvec = pack(pipeline.params)
    key = jax.random.key(5)
    uniforms = jax.random.uniform(
        key, (spec["n_chunks"], spec["n_draws"], 8,
              spec["chunk"] // 8), dtype=jnp.float32,
    )
    rng_g = np.random.default_rng(0)
    gs = {
        "crystal": rng_g.normal(size=(20, 20)).astype(np.float32),
        "detector": rng_g.normal(size=(40, 20)).astype(np.float32),
    }
    return pipeline, forward, vjp, pvec, key, uniforms, gs, spec


def test_forward_images_match_replica(built):
    pipeline, forward, vjp, pvec, key, uniforms, gs, spec = built
    out = forward(pvec, key)
    # Replica images via jacobian trick: evaluate the loss with one-hot
    # g to spot-check a few pixels, plus total integral.
    ones = {k: np.ones_like(v) for k, v in gs.items()}
    total_rep = float(_replica_loss(spec, pvec, uniforms, ones))
    total_ker = float(sum(jnp.sum(v) for v in out["image"].values()))
    # f32 summation-order differences (MXU contraction vs einsum).
    np.testing.assert_allclose(total_ker, total_rep, rtol=2e-4)
    # Detected weight is nonzero and below the generated count.
    det = float(jnp.sum(out["image"]["detector"]))
    assert 0 < det < spec["n_total"]


def _manual_gvec(spec, pvec, uniforms, gs, dtype):
    """The kernel's adjoint algorithm (seeds + ``_trace_bwd``) run as
    plain jnp at the requested dtype."""
    optics, src = spec["optics"], spec["src"]
    chunk = spec["chunk"]
    sub = chunk // 8
    n_total = spec["n_total"]
    total = np.zeros(spec["n_slots"], np.float64)
    P = jnp.asarray(pvec, dtype)
    for c in range(spec["n_chunks"]):
        slot = [0]

        def draw():
            k = slot[0]
            slot[0] += 1
            return uniforms[c, k].astype(dtype)

        rows = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 1)
        alive = (c * chunk + rows * sub + cols) < n_total
        px, py, pz, dx, dy, dz, lam, w0v, aux = _sample_any(
            spec, draw, sub, P, dtype)
        saved, images_data, _ = FG._trace_fwd(
            optics, src, P, px, py, pz, dx, dy, dz, alive,
            lam=lam, need_saved=True, tables=spec.get("tables"), w0=w0v,
            draw=draw,
        )
        seeds = {}
        for (oi, w_img, fx, fy) in images_data:
            im = optics[oi]["image"]
            g = jnp.asarray(gs[optics[oi]["name"]], dtype)
            xs = jnp.arange(im["nx"], dtype=dtype)
            ys = jnp.arange(im["ny"], dtype=dtype)
            dxt = fx.reshape(-1)[:, None] - xs[None, :]
            dyt = fy.reshape(-1)[:, None] - ys[None, :]
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(dxt))
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(dyt))
            dtx = jnp.where(jnp.abs(dxt) < 1.0, -jnp.sign(dxt), 0.0)
            dty = jnp.where(jnp.abs(dyt) < 1.0, -jnp.sign(dyt), 0.0)
            gw = jnp.einsum("ri,ij,rj->r", tx, g, ty).reshape(8, sub)
            gpx = jnp.einsum("ri,ij,rj->r", dtx, g, ty).reshape(8, sub)
            gpy = jnp.einsum("ri,ij,rj->r", tx, g, dty).reshape(8, sub)
            seeds[oi] = (gw, gpx * w_img, gpy * w_img)
        gslots, wbf, lam_bf = FG._trace_bwd(optics, src, P, saved, seeds)
        src_base = len(optics) * FG.SLOTS_PER_OPTIC
        for j, v in FG._source_slot_grads(src, src_base, wbf, lam_bf,
                                          aux).items():
            gslots[j] = gslots.get(j, 0.0) + v
        for j, v in gslots.items():
            total[j] += float(jnp.sum(v))
    return total


def test_hand_adjoint_matches_autodiff_of_replica(built):
    """The heart of the module: the hand-written backward equals
    ``jax.grad`` of the shared forward. Run at f64, where the comparison
    is exact (the f32 kernel check below allows cancellation noise)."""
    pipeline, forward, vjp, pvec, key, uniforms, gs, spec = built
    pvec64 = jnp.asarray(pvec, jnp.float64)
    g_auto = np.asarray(jax.grad(
        lambda v: _replica_loss(spec, v, uniforms, gs, dtype=jnp.float64)
    )(pvec64))
    g_hand = _manual_gvec(spec, pvec64, uniforms, gs, jnp.float64)
    scale = np.abs(g_auto).max()
    assert scale > 0
    np.testing.assert_allclose(g_hand, g_auto, rtol=1e-9,
                               atol=1e-10 * scale)
    # The gradient is nontrivial across parameter groups: origins, basis,
    # radius, spacing, fwhm all receive signal.
    n16 = FG.SLOTS_PER_OPTIC
    b = 1 * n16  # crystal
    assert np.any(np.abs(g_auto[b:b + 3]) > 0)      # origin
    assert np.any(np.abs(g_auto[b + 3:b + 12]) > 0)  # basis
    assert abs(g_auto[b + 12]) > 0                   # radius
    assert abs(g_auto[b + 13]) > 0                   # spacing
    assert abs(g_auto[b + 14]) > 0                   # fwhm


def test_kernel_vjp_matches_f64_truth(built):
    """The f32 kernel gradient agrees with the f64 truth within f32
    accumulation noise (per-ray terms cancel heavily in some slots)."""
    pipeline, forward, vjp, pvec, key, uniforms, gs, spec = built
    g_truth = _manual_gvec(spec, jnp.asarray(pvec, jnp.float64),
                           uniforms, gs, jnp.float64)
    g_kernel = np.asarray(vjp(pvec, key, gs))
    scale = np.abs(g_truth).max()
    np.testing.assert_allclose(g_kernel, g_truth, rtol=2e-2,
                               atol=5e-3 * scale)


def test_vjp_linear_in_cotangent(built):
    pipeline, forward, vjp, pvec, key, uniforms, gs, spec = built
    g1 = np.asarray(vjp(pvec, key, gs))
    gs2 = {k: 2.0 * v for k, v in gs.items()}
    g2 = np.asarray(vjp(pvec, key, gs2))
    np.testing.assert_allclose(g2, 2.0 * g1, rtol=1e-5, atol=1e-8)


def test_grad_matches_xla_engine_statistically():
    """d(sum(detector))/d(crystal_spacing) from the fused vjp agrees with
    the XLA weight-mode engine's jax.grad within MC tolerance (different
    samplers -> different rays)."""
    from xicsrt_tpu.gradients import make_differentiable

    intensity = 1 << 15
    pipeline = Pipeline(_config(intensity))
    forward, vjp, pack, spec = FG.build_fused_diff(
        pipeline, chunk=1024, interpret=True, rng="input"
    )
    pvec = pack(pipeline.params)
    gs = {"crystal": np.zeros((20, 20), np.float32),
          "detector": np.ones((40, 20), np.float32)}
    slot = FG.SLOTS_PER_OPTIC * 1 + 13  # crystal spacing
    g_f = np.asarray([
        float(vjp(pvec, jax.random.key(k), gs)[slot]) for k in range(4)
    ])

    config = _config(intensity)
    config["general"]["dtype"] = "float64"
    image_fn, pipe2 = make_differentiable(config)
    params = pipe2.params
    d0 = params["optics"]["crystal"]["crystal_spacing"]

    def loss(d, key):
        p = dict(params)
        p["optics"] = dict(params["optics"])
        p["optics"]["crystal"] = dict(params["optics"]["crystal"])
        p["optics"]["crystal"]["crystal_spacing"] = d
        return jnp.sum(image_fn(p, key)["detector"])

    gfn = jax.jit(jax.grad(loss))
    g_x = np.asarray([float(gfn(d0, jax.random.key(k))) for k in range(4)])

    mf, sf = g_f.mean(), g_f.std(ddof=1) / 2.0
    mx, sx = g_x.mean(), g_x.std(ddof=1) / 2.0
    assert abs(mf) > 5 * sf, (mf, sf)
    assert abs(mf - mx) < 6 * np.sqrt(sf**2 + sx**2) + 0.02 * abs(mx), (
        f"fused {mf:.5g}+-{sf:.2g} vs xla {mx:.5g}+-{sx:.2g}"
    )


def test_fused_alignment_recovers_spacing():
    """End-to-end: gradient descent on the packed vector through the
    fused vjp recovers a perturbed d-spacing from target images — the
    BASELINE.json alignment task on the fused path."""
    pipeline, forward, vjp, pack, spec = _build(intensity=1 << 13,
                                                chunk=1024)
    pvec0 = pack(pipeline.params)
    key = jax.random.key(11)
    target = jax.tree_util.tree_map(
        np.asarray, forward(pvec0, key)["image"]
    )

    slot = FG.SLOTS_PER_OPTIC * 1 + 13  # crystal spacing
    d_true = float(pvec0[slot])
    d_pert = d_true * (1.0 + 2e-4)
    pvec = pvec0.at[slot].set(d_pert)

    # Sign descent with a shrinking step (scale-free: the raw gradient
    # magnitude spans orders of magnitude across the Bragg flank).
    step = 2.5e-4
    errs = [abs(d_pert - d_true)]
    for _ in range(12):
        out = forward(pvec, key)
        g = {k: np.asarray(v) - target[k] for k, v in out["image"].items()}
        gv = vjp(pvec, key, g)
        pvec = pvec.at[slot].add(-step * float(np.sign(gv[slot])))
        step *= 0.6
        errs.append(abs(float(pvec[slot]) - d_true))
    assert errs[-1] < 0.2 * errs[0], errs


def _variant_config(kind):
    base = {
        "general": {"number_of_iter": 1, "random_seed": 0,
                    "print_results": False, "keep_history": False,
                    "interact_mode": "weight", "image_mode": "bilinear"},
        "sources": {"source": {
            "class_name": "XicsrtSourceDirected",
            "intensity": 1536, "wavelength": 3.9492,
        }},
        "optics": {},
    }
    det = {
        "class_name": "XicsrtOpticDetector",
        "origin": [0.0, 0.76871290, 0.56904832],
        "zaxis": [0.0, -0.95641806, 0.29200084],
        "xsize": 0.4, "ysize": 0.2, "pixel_size": 0.01,
    }
    src = base["sources"]["source"]
    if kind == "plane_crystal_flat":
        src.update(angular_dist="flat", spread=np.radians(8.0))
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticPlanarCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.3, "ysize": 0.3,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
        }
        base["optics"]["detector"] = det
    elif kind == "sphere_mirror_isotropic":
        src.update(angular_dist="isotropic", spread=np.radians(6.0),
                   xsize=0.01, ysize=0.01, zsize=0.005)
        base["optics"]["mirror"] = {
            "class_name": "XicsrtOpticSphericalMirror",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.3, "ysize": 0.3, "radius": 1.5,
        }
        base["optics"]["detector"] = dict(det, origin=[0.0, 0.9, 0.45],
                                          xsize=1.0, ysize=1.0,
                                          pixel_size=0.025)
    elif kind == "uniform_wavelength":
        src.update(angular_dist="isotropic_xy", spread=np.radians(10.0),
                   wavelength_dist="uniform",
                   wavelength_range=[3.9492 - 0.013, 3.9492 + 0.013])
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
        }
        base["optics"]["detector"] = dict(det, pixel_size=0.02)
    elif kind == "cylinder_crystal":
        src.update(angular_dist="isotropic_xy",
                   spread=np.radians(10.0))
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticCylindricalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
        }
        base["optics"]["detector"] = dict(det, xsize=1.0, ysize=0.5,
                                          pixel_size=0.025)
    elif kind == "convex_cylinder_mirror":
        src.update(angular_dist="isotropic", spread=np.radians(5.0))
        base["optics"]["mirror"] = {
            "class_name": "XicsrtOpticCylindricalMirror",
            "origin": [0.0, 0.0, 0.5],
            "zaxis": [0.0, 0.0, -1.0],
            "xsize": 0.3, "ysize": 0.3, "radius": 2.0, "convex": True,
        }
        base["optics"]["detector"] = dict(det, origin=[0.0, 0.0, -0.5],
                                          zaxis=[0.0, 0.0, 1.0],
                                          xsize=2.0, ysize=2.0,
                                          pixel_size=0.05)
    elif kind == "convex_sphere_flat_xy":
        src.update(angular_dist="flat_xy",
                   spread=[np.radians(5.0), np.radians(7.0)])
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 2.0, "convex": True,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 2e-3,
        }
        base["optics"]["detector"] = dict(det, xsize=1.0, ysize=1.0,
                                          pixel_size=0.025)
    elif kind == "torus_crystal":
        src.update(angular_dist="isotropic_xy", spread=np.radians(10.0))
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticToroidalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2,
            "radius_major": 1.0, "radius_minor": 0.4,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
        }
        base["optics"]["detector"] = dict(det, xsize=1.0, ysize=0.5,
                                          pixel_size=0.025)
    elif kind == "convex_torus_mirror":
        src.update(angular_dist="isotropic", spread=np.radians(5.0))
        base["optics"]["mirror"] = {
            "class_name": "XicsrtOpticToroidalMirror",
            "origin": [0.0, 0.0, 0.5],
            "zaxis": [0.0, 0.0, -1.0],
            "xsize": 0.2, "ysize": 0.2,
            "radius_major": 2.0, "radius_minor": 0.8,
            "convex": [True, False],
        }
        base["optics"]["detector"] = dict(det, origin=[0.0, 0.0, -0.5],
                                          zaxis=[0.0, 0.0, 1.0],
                                          xsize=2.0, ysize=2.0,
                                          pixel_size=0.05)
    elif kind == "file_rocking":
        import tempfile

        from tests.test_coverage_extra import _write_xop_file

        # This geometry's deviations sit at 0.4-11 mrad: give the table
        # a support and width that overlap them, so the interpolated
        # curve (and its slope) actually gates rays.
        xop = tempfile.mkdtemp() + "/diff_pat.dat"
        _write_xop_file(xop, fwhm=1.5e-3, span_urad=4000.0)
        src.update(angular_dist="isotropic_xy", spread=np.radians(10.0))
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "file", "rocking_fwhm": None,
            "rocking_file": xop, "rocking_filetype": "xop",
        }
        base["optics"]["detector"] = dict(det, pixel_size=0.02)
    elif kind == "step_rocking":
        src.update(angular_dist="isotropic_xy", spread=np.radians(10.0))
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "step", "rocking_fwhm": 8e-4,
        }
        base["optics"]["detector"] = dict(det, pixel_size=0.02)
    elif kind == "asym_xy_crystal":
        # Asymmetric isotropic_xy bounds: the in-sampler Newton CDF
        # inversion (parameter-independent, forward-only).
        src.update(angular_dist="isotropic_xy",
                   spread=[-0.15, 0.15, -0.05, 0.12])
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
        }
        base["optics"]["detector"] = dict(det, pixel_size=0.02)
    elif kind == "focused_gaussian_voigt":
        # Round-5 source-matrix closure: focused emission (per-ray
        # basis), gaussian box, exact-Voigt wavelengths, bulk-velocity
        # Doppler — all reparameterized (no parameter dependence), so
        # the adjoint must be unchanged by them.
        base["sources"]["source"] = {
            "class_name": "XicsrtSourceFocused",
            "intensity": 1536, "wavelength": 3.9492,
            "spatial_dist": "gaussian",
            "xsize": 0.004, "ysize": 0.004, "zsize": 0.002,
            "angular_dist": "isotropic", "spread": np.radians(9.0),
            "target": [0.0, -3e-4, 0.80374151],
            "wavelength_dist": "voigt",
            "linewidth": 1e12, "temperature": 1000.0,
            "mass_number": 40.0,
            "velocity": [0.0, 1e5, 0.0],
        }
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
        }
        base["optics"]["detector"] = dict(det, pixel_size=0.02)
    elif kind == "mosaic_sphere":
        # HOPG mosaic crystal: per-layer crystallite normals + the
        # depth-aware survival/reservoir weight estimator, all
        # differentiated in-kernel (incl. mosaic basis -> shape normal).
        src.update(angular_dist="isotropic_xy", spread=np.radians(10.0))
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalMosaicCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 5e-4,
            "mosaic_spread": np.radians(0.05),
            "mosaic_depth": 6,
            "mosaic_cutoff": 1e-4,  # hard prefilter: zero gradient
        }
        base["optics"]["detector"] = dict(det, pixel_size=0.02)
    elif kind == "plasma_cubic":
        # Cubic plasma -> Bragg crystal -> detector: emissivity enters
        # ray weights, temperature the Doppler width (source slots).
        # emissivity chosen for ~1536 expected photons:
        # E * dt * V * sin^2(spread/2) = E * 1e-3 * 1e-6 * 1.2e-3.
        base["sources"] = {"plasma": {
            "class_name": "XicsrtPlasmaCubic",
            "origin": [0.0, 0.0, 0.0],
            "xsize": 0.01, "ysize": 0.01, "zsize": 0.01,
            "target": [0.0, -3e-4, 0.80374151],
            "spread": np.radians(4.0),
            "emissivity": 1.26e15,
            "temperature": 1000.0,
            "mass_number": 40.0,
            "wavelength": 3.9492,
            "time_resolution": 1e-3,
            "bundle_volume": 1e-7,
            "use_poisson": False,
        }}
        base["optics"]["crystal"] = {
            "class_name": "XicsrtOpticSphericalCrystal",
            "origin": [0.0, -3e-4, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.2, "ysize": 0.2, "radius": 1.0,
            "crystal_spacing": 2.45676,
            "rocking_type": "gaussian", "rocking_fwhm": 1e-3,
        }
        base["optics"]["detector"] = dict(det, pixel_size=0.02)
    elif kind == "zsize_sphere_mirror":
        src.update(angular_dist="isotropic", spread=np.radians(6.0))
        base["optics"]["mirror"] = {
            "class_name": "XicsrtOpticSphericalMirror",
            "origin": [0.0, 0.0, 0.80374151],
            "zaxis": [0.0, 0.59497864, -0.80374151],
            "xsize": 0.3, "ysize": 0.3, "zsize": 0.01, "radius": 1.5,
        }
        base["optics"]["detector"] = dict(det, origin=[0.0, 0.9, 0.45],
                                          xsize=1.0, ysize=1.0,
                                          pixel_size=0.025)
    return base


@pytest.mark.parametrize("kind", [
    "plane_crystal_flat",
    "sphere_mirror_isotropic",
    "convex_sphere_flat_xy",
    "cylinder_crystal",
    "convex_cylinder_mirror",
    "uniform_wavelength",
    "torus_crystal",
    "convex_torus_mirror",
    "file_rocking",
    "step_rocking",
    "zsize_sphere_mirror",
    "plasma_cubic",
    "mosaic_sphere",
    "focused_gaussian_voigt",
    "asym_xy_crystal",
])
def test_hand_adjoint_exact_on_variants(kind):
    """f64 exactness of the hand adjoint across the subset's shapes,
    interactions and angular distributions (plane crystal, sphere
    mirror, CONVEX sphere, torus incl. convex-flag pair; flat /
    isotropic / flat_xy; file/step rocking; zsize depth bound;
    extended source)."""
    pipeline = Pipeline(_variant_config(kind))
    forward, vjp, pack, spec = FG.build_fused_diff(
        pipeline, chunk=1024, interpret=True, rng="input"
    )
    pvec = jnp.asarray(pack(pipeline.params), jnp.float64)
    uniforms = jax.random.uniform(
        jax.random.key(3), (spec["n_chunks"], spec["n_draws"], 8,
                            spec["chunk"] // 8), dtype=jnp.float32,
    )
    rng_g = np.random.default_rng(1)
    gs = {}
    for o in pipeline.optics:
        if o.enable_image:
            nx, ny = (int(v) for v in o.image_shape)
            gs[o.name] = rng_g.normal(size=(nx, ny)).astype(np.float32)

    g_auto = np.asarray(jax.grad(
        lambda v: _replica_loss(spec, v, uniforms, gs, dtype=jnp.float64)
    )(pvec))
    g_hand = _manual_gvec(spec, pvec, uniforms, gs, jnp.float64)
    scale = np.abs(g_auto).max()
    assert scale > 0, "variant produced no gradient signal"
    np.testing.assert_allclose(g_hand, g_auto, rtol=1e-8,
                               atol=1e-10 * scale)
    if kind == "plasma_cubic":
        # Source slots carry signal: d/d emissivity and d/d temperature.
        b = len(spec["optics"]) * FG.SLOTS_PER_OPTIC
        assert abs(g_auto[b + 0]) > 0, "no emissivity gradient"
        assert abs(g_auto[b + 1]) > 0, "no temperature gradient"


@pytest.mark.parametrize("kind", ["torus_crystal", "file_rocking",
                                  "plasma_cubic", "mosaic_sphere"])
def test_kernel_vjp_on_variants(kind):
    """The interpreted Pallas kernels (f32, table VMEM inputs, in-kernel
    torus solver) reproduce the f64 replica gradient for the round-5
    additions within f32 accumulation noise."""
    pipeline = Pipeline(_variant_config(kind))
    forward, vjp, pack, spec = FG.build_fused_diff(
        pipeline, chunk=1024, interpret=True, rng="input"
    )
    pvec = pack(pipeline.params)
    key = jax.random.key(7)
    uniforms = jax.random.uniform(
        key, (spec["n_chunks"], spec["n_draws"], 8,
              spec["chunk"] // 8), dtype=jnp.float32,
    )
    rng_g = np.random.default_rng(2)
    gs = {}
    for o in pipeline.optics:
        if o.enable_image:
            nx, ny = (int(v) for v in o.image_shape)
            gs[o.name] = rng_g.normal(size=(nx, ny)).astype(np.float32)
    g_truth = _manual_gvec(spec, jnp.asarray(pvec, jnp.float64),
                           uniforms, gs, jnp.float64)
    g_kernel = np.asarray(vjp(pvec, key, gs))
    scale = np.abs(g_truth).max()
    assert scale > 0
    np.testing.assert_allclose(g_kernel, g_truth, rtol=2e-2,
                               atol=5e-3 * scale)
    if kind == "torus_crystal":
        # radius_minor (slot 16) gets signal on a torus.
        assert abs(g_truth[0 * FG.SLOTS_PER_OPTIC + 16]) > 0


def test_sharded_fused_gradients():
    """The fused vjp composes with the mesh: per-device kernels, psum'd
    images and gradient vectors (8 virtual devices). Totals and the
    spacing-slot gradient agree with single-device within MC tolerance."""
    from xicsrt_tpu.gradients import make_fused_differentiable

    intensity = 1 << 14
    gs = {"crystal": np.zeros((20, 20), np.float32),
          "detector": np.ones((40, 20), np.float32)}
    slot = FG.SLOTS_PER_OPTIC * 1 + 13

    f1, v1, pack1, p1 = make_fused_differentiable(
        _config(intensity), chunk=1024
    )
    f8, v8, pack8, p8 = make_fused_differentiable(
        _config(intensity), chunk=1024, n_devices=8
    )
    pv1 = pack1(p1.params)
    pv8 = pack8(p8.params)

    t1 = float(jnp.sum(f1(pv1, jax.random.key(0))["image"]["detector"]))
    t8 = float(jnp.sum(f8(pv8, jax.random.key(0))["image"]["detector"]))
    assert t8 > 0
    sigma = np.sqrt(max(t1, 1.0))
    assert abs(t8 - t1) < 8 * sigma, (t8, t1)

    g1 = np.asarray([float(v1(pv1, jax.random.key(k), gs)[slot])
                     for k in range(4)])
    g8 = np.asarray([float(v8(pv8, jax.random.key(k), gs)[slot])
                     for k in range(4)])
    m1, s1 = g1.mean(), g1.std(ddof=1) / 2.0
    m8, s8 = g8.mean(), g8.std(ddof=1) / 2.0
    assert abs(m1) > 5 * s1, (m1, s1)
    assert abs(m8 - m1) < 6 * np.sqrt(s1**2 + s8**2) + 0.02 * abs(m1), (
        f"sharded {m8:.5g}+-{s8:.2g} vs single {m1:.5g}+-{s1:.2g}"
    )


def test_plasma_gradients_fd_and_xla_parity():
    """d(image)/d(emissivity, temperature) on a cubic plasma: emissivity
    matches the exact linear-rate derivative (image/E, finite
    differences are exact); temperature matches central finite
    differences of the fused forward (same frozen rays) and the XLA
    engine's jax.grad through the params-driven Doppler width
    (different sampler -> MC tolerance)."""
    # Hot, point-like plasma + second-moment detector loss: temperature
    # controls the Doppler width, the width functional sees it far above
    # MC noise (measured SNR ~30 over keys; a flat total-weight loss is
    # T-invariant to first order — the line just spreads).
    config = _variant_config("plasma_cubic")
    p = config["sources"]["plasma"]
    p["emissivity"] = 8.3e20
    p["temperature"] = 2e4
    p["xsize"] = p["ysize"] = p["zsize"] = 2e-4
    p["bundle_volume"] = 8e-12
    config["optics"]["detector"]["pixel_size"] = 0.002
    pipeline = Pipeline(config)
    forward, vjp, pack, spec = FG.build_fused_diff(
        pipeline, chunk=1024, interpret=True, rng="input"
    )
    pvec = pack(pipeline.params)
    b = len(spec["optics"]) * FG.SLOTS_PER_OPTIC
    key = jax.random.key(4)

    img0 = np.asarray(forward(pvec, key)["image"]["detector"])
    prof = img0.sum(axis=1)
    cx = (np.arange(len(prof)) * prof).sum() / max(prof.sum(), 1e-9)
    nx, ny = img0.shape
    gs = {}
    for o in pipeline.optics:
        if o.enable_image:
            shape = tuple(int(v) for v in o.image_shape)
            if o.name == "detector":
                gs[o.name] = np.broadcast_to(
                    ((np.arange(nx) - cx) ** 2)[:, None].astype(
                        np.float32), shape).copy()
            else:
                gs[o.name] = np.zeros(shape, np.float32)

    gv = np.asarray(vjp(pvec, key, gs))
    g_det = jnp.asarray(gs["detector"])

    def loss_at(pv):
        out = forward(pv, key)
        return float(jnp.sum(out["image"]["detector"] * g_det))

    # Emissivity: image is exactly linear in E -> FD over a WIDE step is
    # exact (up to f32 noise).
    E0 = float(pvec[b + 0])
    hE = 0.05 * E0
    fd_E = (loss_at(pvec.at[b + 0].add(hE))
            - loss_at(pvec.at[b + 0].add(-hE))) / (2 * hE)
    assert abs(gv[b + 0] - fd_E) < 2e-2 * abs(fd_E), (gv[b + 0], fd_E)

    # Temperature: smooth reparameterized dependence -> central FD.
    T0 = float(pvec[b + 1])
    hT = 0.02 * T0
    fd_T = (loss_at(pvec.at[b + 1].add(hT))
            - loss_at(pvec.at[b + 1].add(-hT))) / (2 * hT)
    assert abs(fd_T) > 0
    assert abs(gv[b + 1] - fd_T) < 0.15 * abs(fd_T) + 1e-12, (
        gv[b + 1], fd_T)

    # XLA engine parity for d/dT (params-driven constant profiles).
    from xicsrt_tpu.gradients import make_differentiable

    xconfig = _variant_config("plasma_cubic")
    xp = xconfig["sources"]["plasma"]
    xp["emissivity"] = 8.3e20
    xp["temperature"] = 2e4
    xp["xsize"] = xp["ysize"] = xp["zsize"] = 2e-4
    xp["bundle_volume"] = 8e-12
    xconfig["optics"]["detector"]["pixel_size"] = 0.002
    xconfig["general"]["dtype"] = "float64"
    image_fn, pipe2 = make_differentiable(xconfig)
    params = pipe2.params
    T_leaf = params["sources"]["plasma"]["temperature"]

    def loss(T, key):
        p = dict(params)
        p["sources"] = {"plasma": dict(params["sources"]["plasma"])}
        p["sources"]["plasma"]["temperature"] = T
        return jnp.sum(image_fn(p, key)["detector"]
                       * g_det.astype(jnp.float64))

    gfn = jax.jit(jax.grad(loss))
    g_x = np.asarray([float(gfn(T_leaf, jax.random.key(k)))
                      for k in range(6)])
    g_f = np.asarray([float(vjp(pvec, jax.random.key(k), gs)[b + 1])
                      for k in range(6)])
    mf, sf = g_f.mean(), g_f.std(ddof=1) / 2.0
    mx, sx = g_x.mean(), g_x.std(ddof=1) / 2.0
    assert abs(mf) > 3 * sf, (mf, sf)
    assert abs(mf - mx) < 6 * np.sqrt(sf**2 + sx**2) + 0.05 * abs(mx), (
        f"fused {mf:.5g}+-{sf:.2g} vs xla {mx:.5g}+-{sx:.2g}"
    )


def test_unsupported_configs_raise():
    config = _config(1024)
    config["sources"]["source"]["use_poisson"] = True
    with pytest.raises(FG.FusedGradUnsupported):
        FG.build_fused_diff(Pipeline(config), interpret=True, rng="input")

    config = _config(1024)
    config["general"]["interact_mode"] = "mc"
    with pytest.raises(FG.FusedGradUnsupported):
        FG.build_fused_diff(Pipeline(config), interpret=True, rng="input")
