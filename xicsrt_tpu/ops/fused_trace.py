"""Fused single-kernel trace engine (Pallas TPU).

The XLA engine is bounded at ~6e8 rays/s on one v5e chip by structure, not
physics: small per-iteration batches pay per-fusion kernel-launch overhead,
large ones pay HBM round-trips of the [N,3] ray state at XLA fusion
boundaries (measured: 2^21/iter -> 4.9e8, 2^22 -> 5.9e8, 2^25 -> 4.4e8
rays/s, invariant to binning backend). This module removes the structure
entirely: ONE Pallas kernel generates rays with the on-core hardware PRNG,
traces the full optic chain, and accumulates the images on the MXU — per-ray
state lives only in VMEM/registers and never touches HBM.

Supported subset (config ``general.engine='fused'``; build raises
``FusedUnsupported`` outside it — ``'auto'`` falls back to the XLA engine):

- Generic/Directed/Focused sources: point or extended (uniform/gaussian
  box), Poisson or counted budgets, isotropic / isotropic_xy (symmetric-y
  closed form, asymmetric-y in-kernel Newton) / flat / flat_xy / gaussian
  angular distributions, monochrome / uniform / voigt wavelengths (exact
  Gauss+Cauchy decomposition), bulk-velocity Doppler, position-based ray
  filters (sightline);
- plasma (bundle) sources up to 2^22 bundles: the O(bundle_count) stage
  runs in XLA per iteration, per-ray bundle attributes ride a windowed
  interval-one-hot MXU gather in-kernel (beyond 4096 bundles the kernel
  DMAs a constant-size bundle window per chunk — zero-count bundles are
  compacted so a chunk's bundle span is bounded by chunk+1), then voxel
  offsets, focused cones, exact-Voigt wavelengths and Doppler;
- optic chain of: plane + none (apertures/detectors, circle/square/
  rectangle/ellipse aperture logic), plane/sphere/cylinder/torus + mirror
  or + crystal with gaussian/step/file rocking (torus quartic solved
  in-kernel with a Mosaic-safe arccos; file curves as tent-weight MXU
  matvec interpolation of a uniformly-resampled table), mosaic crystals
  (unrolled static-depth crystallite loop, any rocking type), and smooth
  mesh optics (build-time Chebyshev height-field surrogate + in-kernel
  Newton, :func:`_fit_cheb_surface`);
- ``mc`` (Bernoulli acceptance) and ``weight`` (probability-weighted)
  interaction modes; nearest and bilinear image binning; float32;
- bounded in-kernel history reservoirs: ``keep_history='found'``
  (chunks with detector hits) and ``keep_history='sampled'`` (first-S
  chunks — an unbiased sample of all rays, found + lost, sized from
  ``history_max_lost``). FULL per-ray history stays an XLA-engine
  feature.

Plasmas beyond 4096 bundles and non-position-based filtered sources run
on the hybrid trace-only path (:func:`build_fused_trace_run`): XLA
generation + this optic chain. Still outside every fused path: faceted
or non-height-field meshes (exact XLA triangle path), float64, FULL ray
history.

Numerical notes vs the XLA engine (validated statistically in tests):

- ``asin`` has no Mosaic lowering; the Bragg deviation
  ``asin(dot) - asin(sin_b)`` is evaluated through the exact sine-difference
  identity ``sin(ti - tb) = dot*cos_b - sqrt(1-dot^2)*sin_b`` followed by a
  cubic asin correction. Exact zero crossing at the Bragg angle for EVERY
  Bragg angle (the round-2 Taylor form had a spurious zero for
  sin_b > sqrt(2/3)); within the rocking support (|delta| < ~1e-2 rad) the
  residual error is O(delta^5) < 1e-11 rad.
- uniforms come from the TPU hardware PRNG (24-bit mantissa), not threefry:
  the fused engine draws a DIFFERENT random stream than the XLA engine for
  the same key.

Reference hot loops this replaces: ``_TraceObject.py:157-291``,
``_InteractCrystal.py:90-196``, ``_XicsrtSourceGeneric.py:198-292``.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedUnsupported(NotImplementedError):
    """Raised when a config is outside the fused-kernel subset."""


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _f(x) -> float:
    return float(np.asarray(x))


def _image_acc_shape(im, image_mode):
    """Kernel accumulator shape for one image (see the flat-packing note
    in ``_trace_chain``): nearest mode packs the flattened image into
    (rows, 128) with zero lane padding; bilinear keeps the image-shaped
    (nx_pad, ny_pad) layout (its +-1-pixel tent splat needs the 2D margin)."""
    if image_mode == "nearest":
        return (im["rows"], 128)
    return (im["nx_pad"], im["ny_pad"])


def _image_unpack(img, nx, ny, image_mode):
    """Host-side view of a kernel accumulator as the (nx, ny) image."""
    if image_mode == "nearest":
        return img.reshape(-1)[:nx * ny].reshape(nx, ny)
    return img[:nx, :ny]


def image_macs_per_ray(nx, ny, image_mode="nearest"):
    """MXU MACs one ray costs in one image's binning contraction (the
    auditable basis of bench.py's mfu field)."""
    nx, ny = int(nx), int(ny)
    if image_mode == "nearest":
        return _round_up(-(-(nx * ny) // 128), 8) * 128
    return _round_up(nx, 8) * _round_up(ny, 128)


def _v3(x) -> tuple:
    a = np.asarray(x, dtype=np.float64).reshape(3)
    return (float(a[0]), float(a[1]), float(a[2]))


# ---------------------------------------------------------------------------
# Build-time extraction of the (static) pipeline structure.
# ---------------------------------------------------------------------------

def _source_spec(source, filter_map=None):
    """Build-time extraction of the full source sampling program.

    Covers the reference source matrix (``_XicsrtSourceGeneric.py:26-186``):
    point/uniform/gaussian spatial, isotropic / isotropic_xy (symmetric-y) /
    flat / flat_xy / gaussian angular, monochrome / uniform / voigt
    wavelengths (voigt as the exact Gauss+Cauchy decomposition), bulk
    velocity Doppler, Poisson ray budgets, Directed/Focused emission
    axes, and position-based ray filters (sightline cylinder test,
    ``filters/sightline.py``). Each stage counts its uniform draws so the
    ``input`` RNG mode stays exactly reproducible.
    """
    from xicsrt_tpu.sources.generic import SourceDirected, SourceFocused
    from xicsrt_tpu.sources.plasma import PlasmaGeneric

    if isinstance(source, PlasmaGeneric):
        return _plasma_spec(source)
    p = source.param

    spec = {"n_draws": 0, "filters": _filter_specs(p, filter_map)}

    # --- spatial ---------------------------------------------------------
    sizes = tuple(_f(p.get(k) or 0.0) for k in ("xsize", "ysize", "zsize"))
    spatial = str(p.get("spatial_dist", "uniform")).lower()
    if all(s == 0.0 for s in sizes):
        spatial = "point"
    elif spatial == "gaussian":
        sizes = tuple(s / (2.0 * math.sqrt(2.0 * math.log(2.0)))
                      for s in sizes)  # fwhm -> sigma
    elif spatial != "uniform":
        raise FusedUnsupported(f"spatial_dist {spatial}")
    spec["spatial"] = spatial
    spec["sizes"] = sizes
    if spatial != "point":
        spec["n_draws"] += sum(1 for s in sizes if s != 0.0)

    # --- angular ---------------------------------------------------------
    angular = str(p["angular_dist"]).lower()
    from xicsrt_tpu.ops.spread import parse_spread_single, parse_spread_xy

    if angular == "isotropic":
        theta = parse_spread_single(p["spread"])
        dist = ("isotropic", math.cos(theta))
    elif angular == "isotropic_xy":
        tx0, tx1, ty0, ty1 = parse_spread_xy(p["spread"])
        if ty0 == -ty1 and ty1 > 0:
            sb1 = math.sin(ty1)
            g0 = 2.0 * math.asin(math.sin(tx0) * sb1)
            g1 = 2.0 * math.asin(math.sin(tx1) * sb1)
            dist = ("isotropic_xy", g0, g1, sb1,
                    math.tan(ty0), math.tan(ty1))
        else:
            # Asymmetric y-bounds: the marginal CDF in sin(alpha) is a
            # difference of arcsins with no closed-form inverse
            # (ops/spread.py:116-128); the kernel inverts it with a
            # bracket-clamped Newton loop using the Mosaic-safe
            # polynomial arcsin (polynomials.acos_kernel).
            sx0, sx1 = math.sin(tx0), math.sin(tx1)
            sb0, sb1 = math.sin(ty0), math.sin(ty1)

            def _marg(sx):
                return (math.asin(max(-1.0, min(1.0, sx * sb1)))
                        - math.asin(max(-1.0, min(1.0, sx * sb0))))

            dist = ("isotropic_xy_asym", sx0, sx1, sb0, sb1,
                    _marg(sx0), _marg(sx1),
                    math.tan(ty0), math.tan(ty1))
    elif angular == "flat":
        dist = ("flat", math.tan(parse_spread_single(p["spread"])))
    elif angular == "flat_xy":
        t = parse_spread_xy(p["spread"])
        dist = ("flat_xy", math.tan(t[0]), math.tan(t[1]),
                math.tan(t[2]), math.tan(t[3]))
    elif angular in ("gaussian", "flat_gaussian"):
        hwhm = parse_spread_single(p["spread"])
        dist = ("flat_gaussian",
                math.sin(hwhm / math.sqrt(2.0 * math.log(2.0))))
    else:
        raise FusedUnsupported(f"angular_dist {angular}")
    spec["dist"] = dist
    spec["n_draws"] += 2

    # --- wavelength ------------------------------------------------------
    w0 = _f(p["wavelength"])
    wtype = str(p["wavelength_dist"]).lower()
    if wtype == "monochrome" or (wtype == "voigt"
                                 and source.voigt_table is None):
        wave = ("mono", w0)
    elif wtype == "uniform":
        rng_lo, rng_hi = np.asarray(p["wavelength_range"],
                                    dtype=np.float64)[:2]
        wave = ("uniform", float(rng_lo), float(rng_hi))
        spec["n_draws"] += 1
    elif wtype == "voigt":
        # Exact Voigt = Gauss(sigma) + Cauchy(gamma) decomposition (as the
        # plasma sources use, sources/plasma.py:302-317) instead of the
        # tabulated CDF: same distribution, exact tails.
        from xicsrt_tpu.ops import voigt as voigt_ops

        gamma = voigt_ops.natural_gamma(_f(p["linewidth"]), w0)
        sigma = voigt_ops.doppler_sigma(
            _f(p["temperature"]), _f(p["mass_number"]), w0)
        wave = ("voigt", w0, float(sigma), float(gamma))
        spec["n_draws"] += (1 if sigma > 0 else 0) + (1 if gamma > 0 else 0)
    else:
        raise FusedUnsupported(f"wavelength_dist {wtype}")
    spec["wave"] = wave
    spec["wavelength"] = w0

    velocity = np.asarray(p["velocity"], dtype=np.float64).reshape(3)
    spec["velocity"] = _v3(velocity) if np.any(velocity != 0.0) else None

    # --- poisson budget --------------------------------------------------
    spec["poisson"] = bool(p.get("use_poisson"))
    spec["rate"] = float(getattr(source, "_scaled_intensity",
                                 _f(p.get("intensity", 0.0))))

    # --- frame / emission axis ------------------------------------------
    frame = source.frame
    basis = np.asarray(frame.basis, dtype=np.float64)
    spec["origin"] = _v3(frame.origin)
    spec["basis"] = tuple(_v3(r) for r in basis)
    if isinstance(source, SourceFocused):
        spec["target"] = _v3(np.asarray(p["target"], dtype=np.float64))
        spec["rot"] = None  # per-ray basis from per-ray emission axis
    else:
        if isinstance(source, SourceDirected):
            d = np.asarray(p["direction"], dtype=np.float64)
            d = d / np.linalg.norm(d)
        else:
            d = basis[2]
        # Constant rotation basis, replicating vec.orthogonal_basis on the
        # host (constant because the emission axis is constant).
        o1 = np.cross(d, basis[0]) + np.cross(d, basis[2])
        o1 = o1 / max(np.linalg.norm(o1), 1e-300)
        o2 = np.cross(d, o1)
        o2 = o2 / max(np.linalg.norm(o2), 1e-300)
        spec["rot"] = tuple(_v3(r) for r in np.stack([o2, o1, d]))
        spec["target"] = None
    return spec


def _filter_specs(p, filter_map):
    """Build-time extraction of a source's ray filters.

    Position-based filters are pure per-ray math with baked geometry;
    anything else falls back to the XLA engine (or the hybrid path).
    """
    from xicsrt_tpu.filters.sightline import FilterBase, FilterSightline

    specs = []
    filters = p.get("filters")
    for fname in ([] if filters is None else list(filters)):
        flt = (filter_map or {}).get(fname)
        if isinstance(flt, FilterSightline):
            frame = flt.frame
            specs.append({
                "type": "sightline",
                "origin": _v3(frame.origin),
                "zaxis": _v3(np.asarray(frame.basis)[2]),
                "radius": _f(flt.param["radius"]),
            })
        elif isinstance(flt, FilterBase) and type(flt) is FilterBase:
            continue  # pass-through
        else:
            raise FusedUnsupported(f"source filter {fname!r}")
    return specs


def _plasma_spec(source):
    """Build-time extraction for plasma (bundle) sources.

    The O(bundle_count) stage — bundle origins, profiles, filters, photon
    rates, Poisson counts — runs in XLA per iteration
    (``plasma.make_bundle_tables``); the kernel receives per-iteration
    cumulative-count and attribute tables and does the per-ray work:
    interval-one-hot bundle gather on the MXU (the in-kernel twin of
    ``ops/bundle_gather.py``), voxel offsets, focused-cone directions,
    exact-Voigt wavelengths, Doppler. Cf. the reference's per-bundle
    Python loop ``_XicsrtPlasmaGeneric.py:286-345``.
    """
    p = source.param
    B = int(source.bundle_count)
    if B > 1 << 22:
        # The per-iteration XLA bundle stage (origins, profiles, Poisson
        # counts, compaction sort) is O(B log B) and its tables live in
        # HBM per iteration; beyond ~4e6 bundles that stage dominates.
        # (The reference caps at max_bundles=1e7, _XicsrtPlasmaGeneric
        # .py:155.)
        raise FusedUnsupported(
            f"bundle_count {B} > 2^22 (per-iteration bundle stage would "
            "dominate; use the hybrid trace path)"
        )
    w0 = _f(p["wavelength"])
    mass_number = _f(p["mass_number"])
    # sigma = sigma_conv * sqrt(temp [eV]) (sources/plasma.py:354-361).
    c_light = 299792458.0
    sigma_conv = math.sqrt(
        1.602176634e-19 / (mass_number * 1.66053906892e-27 * c_light**2)
    ) * w0
    frame = source.frame
    basis = np.asarray(frame.basis, dtype=np.float64)
    voxel = float(source.voxel_size)
    n_draws = (3 if voxel > 0.0 else 0) + 2 + 1
    gamma = float(source.gamma)
    if gamma > 0.0:
        n_draws += 1
    return {
        "type": "plasma",
        "n_draws": n_draws,
        "B": B,
        "B_pad": _round_up(max(B, 128), 128),
        "voxel": voxel,
        "basis": tuple(_v3(r) for r in basis),
        "target": _v3(np.asarray(p["target"], dtype=np.float64)),
        "wavelength": w0,
        "sigma_conv": sigma_conv,
        "gamma": gamma,
    }


def _fit_cheb_surface(optic):
    """Fit the mesh with a tensor-Chebyshev height field z(x, y) (build time).

    The XLA mesh path prunes Möller–Trumbore candidates with a uniform
    grid (``optics/mesh_shapes.py``); neither per-ray face gathers nor
    face loops map onto a Pallas TPU kernel (Mosaic has no gather, and a
    dense face loop is VPU-bound at ~1e7 rays/s). But every mesh the
    reference traces in its refine path is a *local-frame height field* —
    its pruning grid lives in the local x-y plane, exactly the
    single-valuedness assumption (``_ShapeMesh.py:350-426``) — and its
    default smooth mode interpolates positions/normals between vertices
    (CloughTocher splines, ``_ShapeMesh.py:221-230``). So the TPU-native
    form of a smooth mesh is a *global smooth surrogate*: fit
    z = sum_ij C_ij T_i(u) T_j(v) to the vertices by least squares
    (adaptive degree), verify the fit reproduces both the vertices and
    the vertex normals, and intersect it in-kernel with an unrolled
    Newton iteration — O(deg^2) multiply-adds per ray, no memory traffic.

    Raises ``FusedUnsupported`` for meshes that are not smooth height
    fields (they stay on the exact XLA triangle path).
    """
    import numpy.polynomial.chebyshev as ncheb

    p = optic.param
    if not bool(p.get("mesh_interpolate", False)):
        raise FusedUnsupported(
            "faceted mesh (mesh_interpolate=False): the fused surrogate "
            "is smooth; the XLA engine traces exact triangles"
        )
    pts = np.asarray(p["mesh_points"], dtype=np.float64)
    normals = p.get("mesh_normals")
    if not bool(p.get("trace_local", False)):
        basis = np.asarray(optic.frame.basis, dtype=np.float64)
        origin = np.asarray(optic.frame.origin, dtype=np.float64)
        pts = (pts - origin) @ basis.T
        if normals is not None:
            normals = np.asarray(normals, dtype=np.float64) @ basis.T
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    lox, hix = float(x.min()), float(x.max())
    loy, hiy = float(y.min()), float(y.max())
    spanx = max(hix - lox, 1e-12)
    spany = max(hiy - loy, 1e-12)
    u = (x - lox) / spanx * 2.0 - 1.0
    v = (y - loy) / spany * 2.0 - 1.0
    tol = 1e-6 * max(spanx, spany)
    C = resid = None
    for deg in (4, 6, 8, 10, 12):
        if deg > 4 and (deg + 1) ** 2 * 1.2 > len(pts):
            break  # under-determined: higher degrees would interpolate noise
        V = ncheb.chebvander2d(u, v, [deg, deg])
        coef, *_ = np.linalg.lstsq(V, z, rcond=None)
        resid = float(np.abs(V @ coef - z).max())
        if resid <= tol:
            C = coef.reshape(deg + 1, deg + 1)
            break
    if C is None:
        raise FusedUnsupported(
            f"mesh is not a smooth height field (Chebyshev fit residual "
            f"{resid:.2e} > {tol:.2e})"
        )
    # Derivative coefficient matrices in the same basis (du/dx = 2/spanx).
    Cx = np.zeros_like(C)
    Cx[:-1, :] = ncheb.chebder(C, axis=0) * (2.0 / spanx)
    Cy = np.zeros_like(C)
    Cy[:, :-1] = ncheb.chebder(C, axis=1) * (2.0 / spany)
    if normals is not None:
        # The surrogate's normals must reproduce the mesh vertex normals
        # (the quantities Bragg physics is sensitive to). Barycentric
        # vertex-normal interpolation on the XLA path deviates from the
        # smooth field by O(h^2 / R^2); 5e-4 rad is far above that for
        # every generated mesh and catches genuinely inconsistent
        # user-supplied normals.
        zx = ncheb.chebval2d(u, v, Cx)
        zy = ncheb.chebval2d(u, v, Cy)
        m = np.stack([-zx, -zy, np.ones_like(zx)], axis=-1)
        m /= np.linalg.norm(m, axis=-1, keepdims=True)
        n = np.asarray(normals, dtype=np.float64)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        dot = np.clip(np.abs(np.sum(m * n, axis=-1)), -1.0, 1.0)
        worst = float(np.arccos(dot).max())
        if worst > 5e-4:
            raise FusedUnsupported(
                f"mesh normals deviate {worst:.2e} rad from the fitted "
                "surface gradient"
            )
    zmid = float(z.min() + z.max()) / 2.0
    # Drop negligible coefficients (odd terms of symmetric surfaces):
    # zeroed entries are skipped when the kernel unrolls the sums.
    cut = 1e-13 * max(np.abs(C).max(), 1.0)
    C[np.abs(C) < cut] = 0.0
    Cx[np.abs(Cx) < cut * (2.0 / spanx)] = 0.0
    Cy[np.abs(Cy) < cut * (2.0 / spany)] = 0.0
    return {
        "deg": int(C.shape[0] - 1),
        "C": C.tolist(), "Cx": Cx.tolist(), "Cy": Cy.tolist(),
        "cx": (lox + hix) / 2.0, "cy": (loy + hiy) / 2.0,
        "sx": 2.0 / spanx, "sy": 2.0 / spany,
        # Quadratic convergence from the mid-plane seed: the seed error is
        # the surface sag (<~1e-2 * span), so 4 iterations land at f32
        # roundoff with one to spare.
        "zmid": zmid, "tol_c": 1e-5 * max(spanx, spany, 1e-3),
        "iters": 4,
    }


def _optic_spec(optic, wavelength, per_ray_wl, mode="mc"):
    from xicsrt_tpu.optics.interactions import (
        InteractCrystal, InteractMirror, InteractMosaicCrystal, InteractNone,
    )
    from xicsrt_tpu.optics.mesh_shapes import ShapeMesh
    from xicsrt_tpu.optics.shapes import (
        ShapeCylinder, ShapePlane, ShapeSphere, ShapeTorus,
    )

    p = optic.param
    frame = optic.frame
    spec = {
        "name": optic.name,
        "origin": _v3(frame.origin),
        "bx": _v3(np.asarray(frame.basis)[0]),
        "by": _v3(np.asarray(frame.basis)[1]),
        "bz": _v3(np.asarray(frame.basis)[2]),
        "xsize": _f(p["xsize"]) if p.get("xsize") else None,
        "ysize": _f(p["ysize"]) if p.get("ysize") else None,
        "zsize": _f(p["zsize"]) if p.get("zsize") else None,
        "check_size": bool(p.get("check_size", True)),
        "apertures": [],
        "image": None,
    }
    if bool(p.get("check_aperture", True)):
        for ap in optic.aperture_spec:
            shape = ap["shape"]
            if shape not in ("none", "circle", "square", "rectangle",
                             "ellipse"):
                raise FusedUnsupported(f"aperture shape {shape}")
            spec["apertures"].append({
                "shape": shape,
                "logic": ap["logic"],
                "ox": float(ap["origin"][0]),
                "oy": float(ap["origin"][1]),
                "size": tuple(float(s) for s in ap.get("size", ())),
            })
    if optic.enable_image:
        nx, ny = optic.image_shape
        spec["image"] = {
            "nx": int(nx), "ny": int(ny), "ps": float(optic.pixel_size),
            "nx_pad": _round_up(int(nx), 8), "ny_pad": _round_up(int(ny), 128),
            # Nearest-mode accumulators are FLAT-packed: pixel (ix, iy) bins
            # into flat index ix*ny+iy laid out as (rows, 128), so the MXU
            # contraction costs ~nx*ny MACs/ray instead of
            # nx_pad*ny_pad (the (104, 128) layout wasted ~60% of the
            # flagship's binning MACs as lane padding of ny=50..100 images).
            "rows": _round_up(-(-(int(nx) * int(ny)) // 128), 8),
        }

    if isinstance(optic, ShapePlane):
        spec["shape"] = "plane"
    elif isinstance(optic, ShapeSphere):
        spec["shape"] = "sphere"
        spec["radius"] = _f(p["radius"])
        spec["convex"] = bool(p.get("convex", False))
    elif isinstance(optic, ShapeCylinder):
        spec["shape"] = "cylinder"
        spec["radius"] = _f(p["radius"])
        spec["convex"] = bool(p.get("convex", False))
    elif isinstance(optic, ShapeTorus):
        spec["shape"] = "torus"
        spec["radius_major"] = _f(p["radius_major"])
        spec["radius_minor"] = _f(p["radius_minor"])
        spec["major_adjust"] = _f(p["major_adjust"])
        spec["center_sign"] = _f(p["center_sign"])
    elif isinstance(optic, ShapeMesh):
        spec["shape"] = "cheb"
        spec["cheb"] = _fit_cheb_surface(optic)
    else:
        raise FusedUnsupported(f"shape of {type(optic).__name__}")

    if isinstance(optic, InteractCrystal):
        if not p.get("check_bragg", True):
            spec["interact"] = "mirror"
        else:
            rtype = str(p["rocking_type"]).lower()
            if rtype not in ("gaussian", "step", "file"):
                raise FusedUnsupported(f"rocking_type {rtype}")
            spacing = _f(p["crystal_spacing"])
            spec["interact"] = "crystal"
            # mc mode Bernoulli-accepts with one uniform; weight mode
            # multiplies the ray weight by the probability (no draw).
            spec["n_draws"] = 1 if mode == "mc" else 0
            spec["rocking"] = {
                "type": rtype,
                "reflectivity": _f(p["reflectivity"]),
                "inv_2d": 1.0 / (2.0 * spacing),
            }
            if rtype == "file":
                # Resample the sigma/pi-mixed curve onto a uniform grid:
                # in-kernel linear interpolation becomes ONE tent-weight
                # matvec on the MXU per sublane (no Mosaic gather needed) —
                # the same factorization as the image binning.
                tab = optic.rocking_table
                mix = _f(p.get("rocking_mix", 0.5))
                dtheta = np.asarray(tab["dtheta"], dtype=np.float64)
                curve = (mix * np.asarray(tab["reflect_s"], np.float64)
                         + (1.0 - mix) * np.asarray(tab["reflect_p"],
                                                    np.float64))
                K = int(min(2048, _round_up(max(4 * len(dtheta), 128), 128)))
                lo, hi = float(dtheta.min()), float(dtheta.max())
                grid = np.linspace(lo, hi, K)
                spec["rocking"]["table"] = np.interp(
                    grid, dtheta, curve, left=0.0, right=0.0
                ).astype(np.float32)
                spec["rocking"]["lo"] = lo
                spec["rocking"]["inv_step"] = (K - 1) / (hi - lo)
                spec["rocking"]["K"] = K
            else:
                spec["rocking"]["fwhm"] = _f(p["rocking_fwhm"])
            if not per_ray_wl:
                sin_b = wavelength / (2.0 * spacing)
                if not (0.0 < sin_b < 1.0):
                    raise FusedUnsupported("wavelength outside Bragg range")
                spec["rocking"]["sin_b"] = sin_b
                spec["rocking"]["cos_b"] = math.sqrt(1.0 - sin_b * sin_b)
            if isinstance(optic, InteractMosaicCrystal):
                # Multi-layer crystallite model, unrolled to a static depth
                # (cf. _InteractMosaicCrystal.py:53-139 and the XLA
                # fori_loop in optics/interactions.py).
                spec["interact"] = "mosaic"
                depth = int(p["mosaic_depth"])
                spread = _f(p["mosaic_spread"])
                hwhm = spread / 2.0
                spec["mosaic"] = {
                    "depth": depth,
                    # flat_gaussian crystallite sigma (ops/spread.py:208).
                    "sigma_n": math.sin(
                        hwhm / math.sqrt(2.0 * math.log(2.0))),
                    "cutoff_angle": (
                        math.sqrt(-math.log(_f(p["mosaic_cutoff"])) * 2.0)
                        * spread / (2.0 * math.sqrt(2.0 * math.log(2.0)))
                        if p.get("mosaic_cutoff") is not None else None),
                }
                spec["n_draws"] = 3 * depth
    elif isinstance(optic, InteractMirror):
        spec["interact"] = "mirror"
    elif isinstance(optic, InteractNone):
        spec["interact"] = "none"
    else:
        raise FusedUnsupported(f"interaction of {type(optic).__name__}")
    return spec


# ---------------------------------------------------------------------------
# Kernel builder.
# ---------------------------------------------------------------------------


def _collect_tables(optics):
    """Pop file-rocking tables out of the specs into an input list.

    Pallas kernels cannot capture array constants; each table becomes a
    (1, K) VMEM input and the spec keeps its ``slot`` index.
    """
    tables = []
    for o in optics:
        rk = o.get("rocking")
        if rk is not None and rk.get("type") == "file":
            rk["slot"] = len(tables)
            tables.append(np.asarray(rk.pop("table"))[None, :])
    return tables


def torus_local_quadratic_t(o, px, py, pz, dx, dy, dz, alive):
    """The fused engine's torus root solver (pure jnp; shared by the
    megakernel's trace chain and the per-ray parity sweep in
    ``tests/test_fused_engine.py``).

    Newton on the implicit torus equation instead of the closed-form
    quartic: G(t) = (|xz|(t) - R)^2 + y(t)^2 - r^2 with the
    tangent-plane hit as the seed. The quartic path (Ferrari +
    polynomial arccos, used in round 2) costs ~3x more per ray and its
    root-selection rule ("positive root with minimal optic-local |z|")
    is exactly what Newton converges to from a near-patch seed on the
    shallow patches crystal optics are. Rays that miss leave |G| large
    (or t <= 0) and are masked; NaN iterates fail the comparisons.

    ``o``: spec dict with origin/bx/by/bz rows and radius_major/
    radius_minor/major_adjust/center_sign (see ``_optic_spec``).
    Returns ``(t, mask, center, r_maj)`` (t zeroed where masked).
    """
    p0, bz = o["origin"], o["bz"]
    r_min = o["radius_minor"]
    r_maj = o["radius_major"] + o["major_adjust"] * r_min
    C = (p0[0] + o["center_sign"] * o["radius_major"] * bz[0],
         p0[1] + o["center_sign"] * o["radius_major"] * bz[1],
         p0[2] + o["center_sign"] * o["radius_major"] * bz[2])
    bxr_, byr_ = o["bx"], o["by"]
    # Torus-centered local coordinates (torus axis = local y).
    rx_, ry_, rz_ = px - C[0], py - C[1], pz - C[2]
    Olx = rx_ * bxr_[0] + ry_ * bxr_[1] + rz_ * bxr_[2]
    Oly = rx_ * byr_[0] + ry_ * byr_[1] + rz_ * byr_[2]
    Olz = rx_ * bz[0] + ry_ * bz[1] + rz_ * bz[2]
    Dlx = dx * bxr_[0] + dy * bxr_[1] + dz * bxr_[2]
    Dly = dx * byr_[0] + dy * byr_[1] + dz * byr_[2]
    Dlz = dx * bz[0] + dy * bz[1] + dz * bz[2]
    # Seed: intersection with the optic tangent plane at p0.
    z0_ = ((px - p0[0]) * bz[0] + (py - p0[1]) * bz[1]
           + (pz - p0[2]) * bz[2])
    zd_safe = jnp.where(jnp.abs(Dlz) > 1e-9, Dlz, 1e-9)
    t = -z0_ / zd_safe
    step = jnp.zeros_like(t)
    # 4 local-quadratic iterations suffice from the tangent-plane
    # seed (the r4 second-order step converges faster than the
    # plain Newton that needed 5): gated by the wide-spread
    # grazing regression test, the convex-flag parity matrix, and the
    # per-ray silhouette sweep.
    for _newton in range(4):
        X_ = Olx + t * Dlx
        Y_ = Oly + t * Dly
        Z_ = Olz + t * Dlz
        # One rsqrt per iteration replaces a sqrt and two divisions
        # (sqrt/div run ~20x slower than FMA on the VPU — ROOFLINE.json
        # put the sqrt-div class at 26% of the toroidal row's time):
        # rho = s2 * rsqrt(s2), and /rho becomes * inv_rho.
        s2 = jnp.maximum(X_ * X_ + Z_ * Z_, 1e-30)
        inv_rho = jax.lax.rsqrt(s2)
        rho = s2 * inv_rho
        rr = rho - r_maj
        G = rr * rr + Y_ * Y_ - r_min * r_min
        rhop = (X_ * Dlx + Z_ * Dlz) * inv_rho
        Gp = 2.0 * rr * rhop + 2.0 * Y_ * Dly
        # Grazing rays make the patch root a (near-)double root:
        # plain Newton converges only LINEARLY there and the
        # 5-iteration step test classified ~6% of a wide-spread
        # cone's silhouette band as misses (ADVICE r3, caught by
        # test_torus_wide_spread_grazing). Take the root of the
        # LOCAL QUADRATIC model instead — exact for double roots,
        # identical to Newton as G'' -> 0 — and fall back to the
        # Newton step where the model has no real root (true
        # misses: |step| then stays large and the ray masks out).
        rhopp = ((Dlx * Dlx + Dlz * Dlz) - rhop * rhop) * inv_rho
        Gpp = 2.0 * (rhop * rhop + rr * rhopp) + 2.0 * Dly * Dly
        disc = Gp * Gp - 2.0 * Gpp * G
        sgn = jnp.where(Gp >= 0.0, 1.0, -1.0)
        denom_q = Gp + sgn * jnp.sqrt(jnp.maximum(disc, 0.0))
        denom_q = jnp.where(
            jnp.abs(denom_q) > 1e-12, denom_q, sgn * 1e-12)
        Gp_safe = jnp.where(jnp.abs(Gp) > 1e-12, Gp, sgn * 1e-12)
        # ONE division: select the denominator, then divide.
        den = jnp.where(disc >= 0.0, 0.5 * denom_q, Gp_safe)
        step = G / den
        t = t - step
    # Converged iff the last Newton step is tiny (quadratic
    # convergence); the hit-point normal uses the final t, so it
    # carries no staleness.
    m_int = alive & (jnp.abs(step) < 1e-5 * max(1.0, r_maj)) \
        & (t > 1e-6)
    t = jnp.where(m_int, t, 0.0)
    return t, m_int, C, r_maj


def _trace_chain(optics, sub, keep_meta, keep_images, draw, count_into,
                 image_refs, table_refs, px, py, pz, dx, dy, dz, wl,
                 alive, wt=None, mode="mc", image_mode="nearest",
                 record=None):
    """Shared optic-chain body for both fused kernels (megakernel and
    trace-only): intersect -> bounds/aperture -> interact -> count ->
    image-accumulate for every optic, entirely in VMEM/registers.

    ``record(elem, px, py, pz, dx, dy, dz, wl, alive, wt)`` (optional) is
    called with the post-element ray state after each optic — the
    found-history reservoir's capture hook (element 0, the source, is the
    caller's job)."""
    f32 = jnp.float32

    def normal_draw():
        u = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
        return math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0)

    def rock_prob(rk, delta):
        """Reflection probability from the rocking curve at deviation
        ``delta`` [rad] (gaussian / step / file — shared by the crystal
        and mosaic branches; cf. ``_InteractCrystal.py:136-196``)."""
        if rk["type"] == "gaussian":
            sigma = rk["fwhm"] / (2.0 * math.sqrt(2.0 * math.log(2.0)))
            return rk["reflectivity"] * jnp.exp(-0.5 * (delta / sigma) ** 2)
        if rk["type"] == "step":
            return jnp.where(jnp.abs(delta) <= rk["fwhm"] / 2.0,
                             rk["reflectivity"], 0.0)
        # file: tent-weight matvec interpolation on the MXU. Linear
        # interpolation == contraction with tent weights
        # max(0, 1 - |f - k|): one (1,K)x(K,sub) matvec per sublane (same
        # factorization trick as the image binning; no Mosaic gather
        # exists).
        K = rk["K"]
        T = table_refs[rk["slot"]][:]  # (1, K) VMEM input
        fidx = (delta - rk["lo"]) * rk["inv_step"]
        inr = (fidx >= 0.0) & (fidx <= K - 1)
        fidx = jnp.clip(fidx, 0.0, K - 1.0)
        kio = jax.lax.broadcasted_iota(jnp.int32, (K, sub), 0).astype(f32)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 0)
        prob = jnp.zeros((8, sub), f32)
        for s in range(8):
            tent = jnp.maximum(0.0, 1.0 - jnp.abs(fidx[s][None, :] - kio))
            val = jax.lax.dot_general(
                T, tent,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # (1, sub)
            prob = prob + jnp.where(rows_i == s, val[0][None, :], 0.0)
        return jnp.where(inr, prob * rk["reflectivity"], 0.0)

    # ---- optic chain ------------------------------------------------
    img_slot = 0
    for ei, o in enumerate(optics):
        p0 = o["origin"]
        bz = o["bz"]
        if o["shape"] == "plane":
            denom = dx * bz[0] + dy * bz[1] + dz * bz[2]
            numer = ((p0[0] - px) * bz[0] + (p0[1] - py) * bz[1]
                     + (p0[2] - pz) * bz[2])
            safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
            t = numer / safe
            m_int = alive & (t >= 0.0) & (jnp.abs(denom) > 1e-30)
            nxv = jnp.full((8, sub), bz[0], f32)
            nyv = jnp.full((8, sub), bz[1], f32)
            nzv = jnp.full((8, sub), bz[2], f32)
        elif o["shape"] == "sphere":  # cf. optics/shapes.py ShapeSphere
            sign = -1.0 if o["convex"] else 1.0
            radius = o["radius"]
            C = (p0[0] + sign * radius * bz[0],
                 p0[1] + sign * radius * bz[1],
                 p0[2] + sign * radius * bz[2])
            Lx, Ly, Lz = C[0] - px, C[1] - py, C[2] - pz
            t_ca = Lx * dx + Ly * dy + Lz * dz
            d2 = Lx * Lx + Ly * Ly + Lz * Lz - t_ca * t_ca
            r2 = radius * radius
            m_int = alive & (d2 <= r2)
            t_hc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
            t = t_ca + (-t_hc if o["convex"] else t_hc)
        elif o["shape"] == "cylinder":
            # Axis along the local xaxis (optics/shapes.py ShapeCylinder).
            sign = -1.0 if o["convex"] else 1.0
            radius = o["radius"]
            ax = o["bx"]
            C = (p0[0] + sign * radius * bz[0],
                 p0[1] + sign * radius * bz[1],
                 p0[2] + sign * radius * bz[2])
            dpx, dpy, dpz = px - C[0], py - C[1], pz - C[2]
            d_ax = dx * ax[0] + dy * ax[1] + dz * ax[2]
            p_ax = dpx * ax[0] + dpy * ax[1] + dpz * ax[2]
            A1x, A1y, A1z = (dx - d_ax * ax[0], dy - d_ax * ax[1],
                             dz - d_ax * ax[2])
            B1x, B1y, B1z = (dpx - p_ax * ax[0], dpy - p_ax * ax[1],
                             dpz - p_ax * ax[2])
            qa = A1x * A1x + A1y * A1y + A1z * A1z
            qb = 2.0 * (A1x * B1x + A1y * B1y + A1z * B1z)
            qc = B1x * B1x + B1y * B1y + B1z * B1z - radius * radius
            disc = qb * qb - 4.0 * qa * qc
            m_int = alive & (disc >= 0.0)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            sgn = jnp.where(qb >= 0.0, 1.0, -1.0)
            qq = -0.5 * (qb + sgn * sq)
            t0_ = qq / jnp.where(jnp.abs(qa) > 1e-30, qa, 1e-30)
            t1_ = qc / jnp.where(jnp.abs(qq) > 1e-30, qq, 1e-30)
            t1_ = jnp.where(jnp.abs(qq) > 1e-30, t1_, t0_)
            t = (jnp.minimum(t0_, t1_) if o["convex"]
                 else jnp.maximum(t0_, t1_))
            t = jnp.where(m_int, t, 0.0)
        elif o["shape"] == "cheb":
            # Smooth mesh surrogate z = C_ij T_i(u) T_j(v) in the optic
            # local frame (_fit_cheb_surface): Newton on
            # F(t) = Olz + t Dlz - z(x(t), y(t)), coefficients unrolled as
            # compile-time constants. The final evaluation yields the
            # surface gradient, i.e. the (smoothly interpolated) normal.
            ch = o["cheb"]
            bxr_, byr_ = o["bx"], o["by"]
            rx0, ry0, rz0 = px - p0[0], py - p0[1], pz - p0[2]
            Olx = rx0 * bxr_[0] + ry0 * bxr_[1] + rz0 * bxr_[2]
            Oly = rx0 * byr_[0] + ry0 * byr_[1] + rz0 * byr_[2]
            Olz = rx0 * bz[0] + ry0 * bz[1] + rz0 * bz[2]
            Dlx = dx * bxr_[0] + dy * bxr_[1] + dz * bxr_[2]
            Dly = dx * byr_[0] + dy * byr_[1] + dz * byr_[2]
            Dlz = dx * bz[0] + dy * bz[1] + dz * bz[2]
            safe_dz = jnp.where(jnp.abs(Dlz) > 1e-9, Dlz, 1e-9)

            def cheb_eval(coefs, Ti, Tj):
                acc_ = None
                for i_, row in enumerate(coefs):
                    for j_, cc in enumerate(row):
                        if cc == 0.0:
                            continue
                        term = cc * Ti[i_] * Tj[j_]
                        acc_ = term if acc_ is None else acc_ + term
                if acc_ is None:
                    return jnp.zeros_like(Ti[0])
                return acc_

            def surface(t_):
                hx = Olx + t_ * Dlx
                hy = Oly + t_ * Dly
                u_ = (hx - ch["cx"]) * ch["sx"]
                v_ = (hy - ch["cy"]) * ch["sy"]
                # Clip so divergent iterates keep the polynomial tame;
                # the domain test below uses the unclipped values.
                uc = jnp.clip(u_, -1.25, 1.25)
                vc = jnp.clip(v_, -1.25, 1.25)
                deg = ch["deg"]
                Ti = [jnp.ones_like(uc), uc]
                Tj = [jnp.ones_like(vc), vc]
                for _k in range(deg - 1):
                    Ti.append(2.0 * uc * Ti[-1] - Ti[-2])
                    Tj.append(2.0 * vc * Tj[-1] - Tj[-2])
                zs = cheb_eval(ch["C"], Ti, Tj)
                zxs = cheb_eval(ch["Cx"], Ti, Tj)
                zys = cheb_eval(ch["Cy"], Ti, Tj)
                return u_, v_, zs, zxs, zys

            # Convergence is judged by the LAST Newton step instead of a
            # final re-evaluation (quadratic convergence: |step_k| bounds
            # |t - root| once converging) — one fewer surface evaluation.
            # The gradient/normal is one converged step stale: position
            # error < tol_c (1e-5*span) maps to a normal error below
            # curvature * tol_c ~ 1e-6 rad, far under any rocking width.
            t = (ch["zmid"] - Olz) / safe_dz
            step = jnp.zeros_like(t)
            u_ = v_ = zxs = zys = None
            for _newton in range(ch["iters"]):
                u_, v_, zs, zxs, zys = surface(t)
                F = Olz + t * Dlz - zs
                Fp = Dlz - zxs * Dlx - zys * Dly
                Fp = jnp.where(jnp.abs(Fp) > 1e-9, Fp, 1e-9)
                step = F / Fp
                t = t - step
            m_int = (alive & (jnp.abs(step) < ch["tol_c"]) & (t > 1e-6)
                     & (jnp.abs(u_) <= 1.0) & (jnp.abs(v_) <= 1.0))
            t = jnp.where(m_int, t, 0.0)
            # Local gradient normal -> global frame (sign-free physics:
            # reflection and |dot| Bragg tests are orientation-invariant).
            inv = jax.lax.rsqrt(zxs * zxs + zys * zys + 1.0)
            nlx, nly, nlz = -zxs * inv, -zys * inv, inv
            nxv = nlx * bxr_[0] + nly * byr_[0] + nlz * bz[0]
            nyv = nlx * bxr_[1] + nly * byr_[1] + nlz * bz[1]
            nzv = nlx * bxr_[2] + nly * byr_[2] + nlz * bz[2]
        else:  # torus (optics/shapes.py ShapeTorus)
            t, m_int, C, r_maj = torus_local_quadratic_t(
                o, px, py, pz, dx, dy, dz, alive)

        qx = jnp.where(m_int, px + t * dx, px)
        qy = jnp.where(m_int, py + t * dy, py)
        qz = jnp.where(m_int, pz + t * dz, pz)
        if o["shape"] == "sphere":
            # Normal points from the surface towards the center.
            nxv = C[0] - qx
            nyv = C[1] - qy
            nzv = C[2] - qz
            inv = jax.lax.rsqrt(jnp.maximum(
                nxv * nxv + nyv * nyv + nzv * nzv, 1e-30))
            nxv, nyv, nzv = nxv * inv, nyv * inv, nzv * inv
        elif o["shape"] == "cylinder":
            # Normal from the surface towards the axis.
            tcx, tcy, tcz = C[0] - qx, C[1] - qy, C[2] - qz
            along = tcx * ax[0] + tcy * ax[1] + tcz * ax[2]
            nxv = tcx - along * ax[0]
            nyv = tcy - along * ax[1]
            nzv = tcz - along * ax[2]
            inv = jax.lax.rsqrt(jnp.maximum(
                nxv * nxv + nyv * nyv + nzv * nzv, 1e-30))
            nxv, nyv, nzv = nxv * inv, nyv * inv, nzv * inv
        elif o["shape"] == "torus":
            # Project the hit onto the torus axis circle; normal points
            # from the tube center to the hit (global frame).
            ptx, pty, ptz = qx - C[0], qy - C[1], qz - C[2]
            yax = o["by"]
            d_y = ptx * yax[0] + pty * yax[1] + ptz * yax[2]
            plx = ptx - d_y * yax[0]
            ply = pty - d_y * yax[1]
            plz = ptz - d_y * yax[2]
            inv = jax.lax.rsqrt(jnp.maximum(
                plx * plx + ply * ply + plz * plz, 1e-30))
            nxv = ptx - r_maj * plx * inv
            nyv = pty - r_maj * ply * inv
            nzv = ptz - r_maj * plz * inv
            inv = jax.lax.rsqrt(jnp.maximum(
                nxv * nxv + nyv * nyv + nzv * nzv, 1e-30))
            nxv, nyv, nzv = nxv * inv, nyv * inv, nzv * inv

        rx, ry, rz = qx - p0[0], qy - p0[1], qz - p0[2]
        bxr, byr = o["bx"], o["by"]
        lxv = rx * bxr[0] + ry * bxr[1] + rz * bxr[2]
        lyv = rx * byr[0] + ry * byr[1] + rz * byr[2]

        mask = m_int
        if o["check_size"]:
            if o["xsize"]:
                mask = mask & (jnp.abs(lxv) < o["xsize"] / 2.0)
            if o["ysize"]:
                mask = mask & (jnp.abs(lyv) < o["ysize"] / 2.0)
            if o["zsize"]:
                lzv = rx * bz[0] + ry * bz[1] + rz * bz[2]
                mask = mask & (jnp.abs(lzv) < o["zsize"] / 2.0)
        # Aperture logic mirrors ops/aperture.py exactly: m_in is the
        # incoming (bounds) mask, m_out the running logic value; updates
        # apply only inside m_in. Boolean selects are written as logical
        # ops — Mosaic has no i1 select lowering.
        m_in = mask
        m_out = m_in
        for ap in o["apertures"]:
            ax = lxv - ap["ox"]
            ay = lyv - ap["oy"]
            shape = ap["shape"]
            if shape == "none":
                m_test = m_in
            elif shape == "circle":
                r = ap["size"][0]
                m_test = (ax * ax + ay * ay < r * r) & m_in
            elif shape == "square":
                s = ap["size"][0] / 2.0
                m_test = (jnp.abs(ax) < s) & (jnp.abs(ay) < s) & m_in
            elif shape == "rectangle":
                m_test = ((jnp.abs(ax) < ap["size"][0] / 2.0)
                          & (jnp.abs(ay) < ap["size"][1] / 2.0) & m_in)
            else:  # ellipse
                sx_, sy_ = ap["size"][0], ap["size"][1]
                m_test = ((ax / sx_) ** 2 + (ay / sy_) ** 2 < 1.0) & m_in
            logic = ap["logic"]
            if logic == "and":
                new = m_out & m_test
            elif logic == "not":
                new = m_out & ~m_test
            elif logic == "or":
                new = m_out | m_test
            elif logic == "nand":
                new = ~(m_out & m_test)
            elif logic == "nor":
                new = ~(m_out | m_test)
            elif logic == "xor":
                new = m_out ^ m_test
            else:  # xnor
                new = ~(m_out ^ m_test)
            m_out = (m_in & new) | (~m_in & m_out)
        mask = m_out & m_in

        # ---- interaction -------------------------------------------
        if o["interact"] == "crystal":
            rk = o["rocking"]
            dot = dx * nxv + dy * nyv + dz * nzv
            adot = jnp.abs(dot)
            # Exact sine of (incident - bragg); asin via cubic term
            # (|delta| < pi/2 always, so sin is monotone: no spurious
            # zeros at any Bragg angle).
            cosi = jnp.sqrt(jnp.maximum(1.0 - adot * adot, 0.0))
            if wl is None:
                sin_b, cos_b = rk["sin_b"], rk["cos_b"]
            else:
                sin_b = jnp.clip(wl * rk["inv_2d"], 0.0, 1.0)
                cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
            sd = adot * cos_b - cosi * sin_b
            delta = sd + sd * sd * sd * (1.0 / 6.0)
            prob = rock_prob(rk, delta)
            if mode == "mc":
                uacc = draw()
                mask = mask & (prob >= uacc)
            else:  # weight mode (interactions.py:178-189): multiply the
                # ray weight by the probability, reflect every masked ray.
                wt = jnp.where(mask, wt * prob, wt)
            kk = 2.0 * dot
            dx = jnp.where(mask, dx - kk * nxv, dx)
            dy = jnp.where(mask, dy - kk * nyv, dy)
            dz = jnp.where(mask, dz - kk * nzv, dz)
        elif o["interact"] == "mosaic":
            rk = o["rocking"]
            mz = o["mosaic"]
            if wl is None:
                sin_b, cos_b = rk["sin_b"], rk["cos_b"]
            else:
                sin_b = jnp.clip(wl * rk["inv_2d"], 0.0, 1.0)
                cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
            if mz["cutoff_angle"] is not None:
                dot0 = dx * nxv + dy * nyv + dz * nzv
                adot0 = jnp.abs(dot0)
                cosi0 = jnp.sqrt(jnp.maximum(1.0 - adot0 * adot0, 0.0))
                sd0 = adot0 * cos_b - cosi0 * sin_b
                d0 = sd0 + sd0 * sd0 * sd0 * (1.0 / 6.0)
                mask = mask & (jnp.abs(d0) < mz["cutoff_angle"])
            # Per-ray crystallite basis around the macroscopic normal:
            # o1 = cross(n, e1+e3) with hint e1=(1,0,0), e3=(0,0,1)
            # (interactions.py mosaic_normals); constant across layers.
            o1x_, o1y_, o1z_ = nyv, nzv - nxv, -nyv
            inv = jax.lax.rsqrt(jnp.maximum(
                o1x_ * o1x_ + o1y_ * o1y_ + o1z_ * o1z_, 1e-30))
            o1x_, o1y_, o1z_ = o1x_ * inv, o1y_ * inv, o1z_ * inv
            o2x_ = nyv * o1z_ - nzv * o1y_
            o2y_ = nzv * o1x_ - nxv * o1z_
            o2z_ = nxv * o1y_ - nyv * o1x_
            inv = jax.lax.rsqrt(jnp.maximum(
                o2x_ * o2x_ + o2y_ * o2y_ + o2z_ * o2z_, 1e-30))
            o2x_, o2y_, o2z_ = o2x_ * inv, o2y_ * inv, o2z_ * inv
            if mode == "mc":
                refl = jnp.zeros_like(mask)
                for _layer in range(mz["depth"]):
                    gx = mz["sigma_n"] * normal_draw()
                    gy = mz["sigma_n"] * normal_draw()
                    wn = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
                    nmx = gx * wn * o2x_ + gy * wn * o1x_ + wn * nxv
                    nmy = gx * wn * o2y_ + gy * wn * o1y_ + wn * nyv
                    nmz = gx * wn * o2z_ + gy * wn * o1z_ + wn * nzv
                    dotm = dx * nmx + dy * nmy + dz * nmz
                    adot = jnp.abs(dotm)
                    cosi = jnp.sqrt(jnp.maximum(1.0 - adot * adot, 0.0))
                    sd = adot * cos_b - cosi * sin_b
                    delta = sd + sd * sd * sd * (1.0 / 6.0)
                    prob = rock_prob(rk, delta)
                    u = draw()
                    accept = mask & ~refl & (prob >= u)
                    kk = 2.0 * dotm
                    dx = jnp.where(accept, dx - kk * nmx, dx)
                    dy = jnp.where(accept, dy - kk * nmy, dy)
                    dz = jnp.where(accept, dz - kk * nmz, dz)
                    refl = refl | accept
                mask = mask & refl
            else:
                # Weight mode: depth-aware survival weighting with online
                # categorical (reservoir) selection of the reflecting
                # layer — the kernel twin of the XLA path
                # (interactions.py:268-305). The incoming direction is
                # reused for every layer's Bragg test; the chosen layer's
                # reflection replaces the direction at the end.
                d0x, d0y, d0z = dx, dy, dz
                surv = jnp.ones_like(wt)
                cum = jnp.zeros_like(wt)
                for _layer in range(mz["depth"]):
                    gx = mz["sigma_n"] * normal_draw()
                    gy = mz["sigma_n"] * normal_draw()
                    wn = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
                    nmx = gx * wn * o2x_ + gy * wn * o1x_ + wn * nxv
                    nmy = gx * wn * o2y_ + gy * wn * o1y_ + wn * nyv
                    nmz = gx * wn * o2z_ + gy * wn * o1z_ + wn * nzv
                    dotm = d0x * nmx + d0y * nmy + d0z * nmz
                    adot = jnp.abs(dotm)
                    cosi = jnp.sqrt(jnp.maximum(1.0 - adot * adot, 0.0))
                    sd = adot * cos_b - cosi * sin_b
                    delta = sd + sd * sd * sd * (1.0 / 6.0)
                    prob = rock_prob(rk, delta)
                    q = prob * surv
                    cum_new = cum + q
                    u = draw()
                    pick = mask & (u * cum_new < q)
                    kk = 2.0 * dotm
                    dx = jnp.where(pick, d0x - kk * nmx, dx)
                    dy = jnp.where(pick, d0y - kk * nmy, dy)
                    dz = jnp.where(pick, d0z - kk * nmz, dz)
                    surv = surv * (1.0 - prob)
                    cum = cum_new
                wt = jnp.where(mask, wt * cum, wt)
        elif o["interact"] == "mirror":
            kk = 2.0 * (dx * nxv + dy * nyv + dz * nzv)
            dx = jnp.where(mask, dx - kk * nxv, dx)
            dy = jnp.where(mask, dy - kk * nyv, dy)
            dz = jnp.where(mask, dz - kk * nzv, dz)

        px, py, pz = qx, qy, qz
        alive = mask
        if keep_meta:
            count_into(1 + ei, alive)
        if record is not None:
            record(1 + ei, px, py, pz, dx, dy, dz, wl, alive, wt)

        # ---- image accumulation ------------------------------------
        if o["image"] and keep_images:
            im = o["image"]
            fx = lxv * (1.0 / im["ps"]) + (im["nx"] - 1) / 2.0
            fy = lyv * (1.0 / im["ps"]) + (im["ny"] - 1) / 2.0
            ref = image_refs[img_slot]
            if image_mode == "nearest":
                # round-half-to-even, same as the XLA/pallas binning paths
                # (binning.py:36, pallas_binning.py:81) and the reference's
                # np.round (_TraceObject.py:274) — midpoint hits bin
                # identically across engines.
                ix = jnp.round(fx).astype(jnp.int32)
                iy = jnp.round(fy).astype(jnp.int32)
                ok = (alive & (ix >= 0) & (ix < im["nx"])
                      & (iy >= 0) & (iy < im["ny"]))
                # One-hot factorized histogram on the MXU, FLAT-packed:
                # pixel (ix, iy) -> flat = ix*ny + iy, decomposed as
                # row = flat >> 7 (sublane one-hot) x lane = flat & 127
                # (lane one-hot), contracted via A @ B^T over the ray
                # axis into a (rows, 128) accumulator. vs the previous
                # (nx_pad, ny_pad) image-shaped layout this removes ALL
                # lane padding (a (100, 50) image costs 40*128 = 5120
                # MACs/ray instead of 104*128 = 13312); the flat image is
                # reshaped to (nx, ny) once on the host. Dead rays get
                # sentinel flat = rows*128: its row is outside the row
                # iota so the row one-hot (which also carries the weight)
                # is all-zero and the ray contributes nothing.
                flat = jnp.where(ok, ix * im["ny"] + iy, im["rows"] * 128)
                row = jax.lax.shift_right_logical(flat, jnp.int32(7))
                lane = jnp.bitwise_and(flat, jnp.int32(127))
                acc = jnp.zeros((im["rows"], 128), f32)
                rb = jax.lax.broadcasted_iota(
                    jnp.int32, (im["rows"], sub), 0)
                lb = jax.lax.broadcasted_iota(jnp.int32, (128, sub), 0)
                for s in range(8):
                    if wt is None:
                        # Unit weights: exact one-hots, bf16 MXU rate.
                        oxs = (row[s][None, :] == rb).astype(jnp.bfloat16)
                        oys = (lane[s][None, :] == lb).astype(jnp.bfloat16)
                    else:
                        # Weighted: fold the (fractional) ray weight into
                        # the row-side one-hot; f32 matmul keeps the weight
                        # mantissa exact (bf16 would quantize at ~0.4%).
                        oxs = jnp.where(row[s][None, :] == rb,
                                        wt[s][None, :], 0.0)
                        oys = (lane[s][None, :] == lb).astype(f32)
                    acc += jax.lax.dot_general(
                        oxs, oys,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32,
                    )
            else:
                acc = jnp.zeros((im["nx_pad"], im["ny_pad"]), f32)
                # Bilinear splat (binning.py bin_image_bilinear): the
                # corner weight of ray r on pixel (i, j) is
                # max(0, 1-|fx-i|) * max(0, 1-|fy-j|) — separable tents,
                # so the same two-matrix MXU contraction accumulates all
                # four corners at once. Out-of-grid corners land in the
                # padded margin (cropped on output) or at negative
                # indices (tent already zero), matching the per-corner
                # bounds drop of the XLA path.
                xb = jax.lax.broadcasted_iota(
                    jnp.int32, (im["nx_pad"], sub), 0).astype(f32)
                yb = jax.lax.broadcasted_iota(
                    jnp.int32, (im["ny_pad"], sub), 0).astype(f32)
                w_img = jnp.where(alive, 1.0 if wt is None else wt, 0.0)
                # Keep far-away dead rays from generating huge |fx-i|
                # intermediates; their weight is already zero.
                fxc = jnp.clip(fx, -2.0, im["nx"] + 1.0)
                fyc = jnp.clip(fy, -2.0, im["ny"] + 1.0)
                for s in range(8):
                    oxs = (jnp.maximum(0.0, 1.0 - jnp.abs(
                        fxc[s][None, :] - xb)) * w_img[s][None, :])
                    oys = jnp.maximum(
                        0.0, 1.0 - jnp.abs(fyc[s][None, :] - yb))
                    acc += jax.lax.dot_general(
                        oxs, oys,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32,
                    )
            ref[:] += acc
            img_slot += 1


def build_fused_run(pipeline, num_iter: int | None = None,
                    chunk: int = 8192, interpret: bool = False,
                    rng: str | None = None,
                    history_slots: int | None = None,
                    history_mode: str = "found"):
    """Compile the pipeline into one Pallas kernel.

    Returns ``run(key) -> {"meta", "image", "history"}`` tracing
    ``pipeline.num_rays * num_iter`` rays per call. Geometry is baked in as
    compile-time constants (rebuild to change it); use the XLA engine for
    differentiable parameters.

    ``rng``: ``'hw'`` (default on TPU) draws uniforms from the on-core
    hardware PRNG; ``'input'`` streams threefry uniforms generated outside
    the kernel (HBM traffic — slower, but bit-identical across backends and
    the only option under interpret mode, whose ``prng_random_bits`` is a
    zero stub).

    ``history_slots``: found-ray history reservoir (``keep_history='found'``,
    the fused analog of the reference's full-history output,
    ``xicsrt_raytrace.py:229-278``). The kernel mirrors every element's
    post-trace ray state into a VMEM scratch; a chunk whose final element
    keeps at least one ray is DMA'd into one of ``history_slots`` HBM slots
    (first-come, bounded: at most ``history_slots * chunk`` rays of
    history, zero cost on the no-history path). The host reconstructs
    per-element ``Rays`` from the used slots — found rays are complete up
    to the slot budget; the lost rays in those same chunks double as the
    truncated lost sample.
    """
    g = pipeline.general
    mode = str(g.get("interact_mode", "mc")).lower()
    if mode not in ("mc", "weight"):
        raise FusedUnsupported(f"interact_mode {mode!r}")
    image_mode = str(g.get("image_mode", "nearest")).lower()
    if image_mode not in ("nearest", "bilinear"):
        raise FusedUnsupported(f"image_mode {image_mode!r}")
    if str(g.get("dtype", "float32")).lower() not in ("float32", "f32"):
        raise FusedUnsupported("dtype != float32")

    src = _source_spec(
        pipeline.source, {f.name: f for f in pipeline.filters}
    )
    is_plasma = src.get("type") == "plasma"
    # Per-ray wavelengths are materialized only when something varies them.
    per_ray_wl = (True if is_plasma
                  else src["wave"][0] != "mono"
                  or src["velocity"] is not None)
    optics = [_optic_spec(o, src["wavelength"], per_ray_wl, mode)
              for o in pipeline.optics]
    tables = _collect_tables(optics)
    if num_iter is None:
        num_iter = int(g["number_of_iter"])
    if chunk % (8 * 128) != 0:
        raise ValueError("chunk must be a multiple of 1024")
    N_budget = pipeline.num_rays
    plasma_windowed = False
    if is_plasma:
        # The in-kernel bundle gather's windowed one-hot tiles put the
        # plasma kernel's scoped-VMEM peak well above the generic one;
        # chunk 8192 overflows the 16M scoped limit (measured 23.2M).
        chunk = min(chunk, 4096)
        # Beyond 4096 bundles the full per-iteration table no longer fits
        # VMEM as a grid block. Because bundle intervals tile the ray axis
        # CONTIGUOUSLY and the XLA stage compacts zero-count bundles to
        # the back, a chunk of `chunk` rays intersects at most chunk+1
        # bundles — so each chunk reads TWO consecutive chunk-sized pages
        # of the tables, selected by a scalar-prefetched per-chunk page
        # index (Pallas block pipeline does the DMA). Cost per ray is
        # then INDEPENDENT of bundle_count; HBM traffic ~50 B/ray.
        plasma_windowed = src["B_pad"] > 4096
        if plasma_windowed:
            # The unrolled two-page gather's live one-hot tiles scale
            # ~quadratically with chunk (measured scoped-VMEM: 22 MiB at
            # chunk 2048, 106 MiB at 4096); 2048 plus a raised
            # vmem_limit_bytes (below) fits v5e's 128 MiB VMEM.
            chunk = min(chunk, 2048)
            # Page size = chunk: a chunk's (compacted) bundle span of
            # <= chunk+1 rows always fits in two consecutive pages.
            src["page"] = chunk
            src["B_pad"] = _round_up(max(src["B_pad"], 2 * chunk), chunk)
        # Iterations keep their own bundle samples (per-iteration tables
        # selected by the grid index map), so the photon statistics match
        # the XLA engine's per-iteration resampling exactly.
        n_per_iter = _round_up(N_budget, chunk)
        chunks_per_iter = n_per_iter // chunk
        n_chunks = num_iter * chunks_per_iter
        n_total = n_per_iter * num_iter
    else:
        n_total = N_budget * num_iter
        n_chunks = -(-n_total // chunk)
        chunks_per_iter = 0
    if n_total >= 2**31:
        # ray_index and the meta counters are int32; beyond 2^31 they would
        # silently wrap (corrupting the alive mask), so fail loudly.
        raise FusedUnsupported(
            f"num_rays*num_iter = {n_total:.3e} overflows int32 ray indexing"
        )
    sub = chunk // 8

    images = [(i, o["image"]) for i, o in enumerate(optics) if o["image"]]
    n_elems = 1 + len(optics)
    if n_elems > 128:
        raise FusedUnsupported("more than 127 optics")

    keep_meta = bool(g.get("keep_meta", True))
    keep_images = bool(g.get("keep_images", True))
    if not keep_images:
        images = []
    n_images = len(images)

    # History reservoir (see docstring): 'found' claims slots for chunks
    # whose final element kept >= 1 ray; 'sampled' claims the FIRST
    # S_hist chunks unconditionally — an unbiased iid sample of all
    # generated rays (chunks are statistically identical), from which
    # the host splits found/lost and truncates lost to
    # general.history_max_lost (the reference's lost-ray semantics,
    # xicsrt_raytrace.py:229-278, as a bounded on-device sample).
    if history_mode not in ("found", "sampled"):
        raise ValueError(f"history_mode {history_mode!r}")
    if history_slots:
        S_hist = int(history_slots)
    elif history_mode == "sampled":
        S_hist = max(1, -(-int(g.get("history_max_lost") or 10000)
                          // chunk))
    else:
        S_hist = 0
    n_fields = 9 if mode == "weight" else 8
    n_hist_rows = n_fields * n_elems if S_hist else 0

    if rng is None:
        rng = "input" if interpret else "hw"
    if rng not in ("hw", "input"):
        raise ValueError(f"rng must be 'hw' or 'input', got {rng!r}")
    # Static per-ray draw count, tallied per stage during spec building.
    n_draws = src["n_draws"] + sum(o.get("n_draws", 0) for o in optics)

    # Poisson budgets: the realized ray count is drawn OUTSIDE the kernel
    # (threefry, same key stream discipline as the XLA engine) and enters
    # through SMEM; the kernel masks rays beyond it. Sum of per-iteration
    # Poisson(rate) draws == one Poisson(rate*num_iter) draw in
    # distribution, so a single scalar suffices for the whole run.
    # (Plasma totals come via the per-iteration bundle tables instead.)
    poisson_rate = (src["rate"] * num_iter
                    if not is_plasma and src["poisson"] else None)

    f32 = jnp.float32

    def kernel(*refs):
        rest = list(refs)
        if plasma_windowed:
            rest.pop(0)  # scalar-prefetch page array (drives index maps)
        seed_ref = rest.pop(0)
        if rng == "input":
            rng_ref = rest.pop(0)
        if is_plasma:
            if plasma_windowed:
                # Two consecutive bundle PAGES selected by the prefetched
                # per-chunk page index (same underlying per-iteration
                # arrays, two block mappings each).
                (cpp0, cpp1, cp0, cp1, tb0, tb1), rest = (
                    rest[:6], rest[6:]
                )
                plasma_pages = [(cpp0, cp0, tb0), (cpp1, cp1, tb1)]
            else:
                cum_prev_ref, cum_ref, btable_ref, *rest = rest
                plasma_pages = [(cum_prev_ref, cum_ref, btable_ref)]
        table_refs = rest[:len(tables)]
        tail = rest[len(tables):]
        counts_ref = tail[0]
        image_refs = list(tail[1:1 + n_images])
        extra = list(tail[1 + n_images:])
        if S_hist:
            hist_ref = extra.pop(0)
            hist_scratch, slot_ref, dma_sem = extra[:3]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            counts_ref[:] = jnp.zeros_like(counts_ref)
            for ref in image_refs:
                ref[:] = jnp.zeros_like(ref)
            if S_hist:
                slot_ref[0] = 0

        if rng == "hw":
            # program_id cannot feed tpu.prng_set_seed_32 directly; fold the
            # grid step into the second seed word arithmetically instead.
            # (-1640531535 == 0x9E3779B1 as int32; int32 wrap-around is fine —
            # this is just a per-step hash.)
            pltpu.prng_seed(seed_ref[0], seed_ref[1] + step * (-1640531535))

        draw_slot = [0]

        def draw():
            if rng == "input":
                k = draw_slot[0]
                draw_slot[0] += 1
                return rng_ref[k]
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((8, sub)), jnp.int32
            )
            return (bits & 0x00FFFFFF).astype(f32) * (1.0 / (1 << 24))

        def normal_draw():
            # Standard normal via the inverse error function (Mosaic has an
            # erf_inv lowering). Clip keeps erf_inv finite at u in {0, 1};
            # the resulting ~5.3-sigma tail truncation matches the finite
            # range of threefry-based normal sampling.
            u = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
            return math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0)

        rows = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 1)
        if is_plasma:
            # Iteration-LOCAL ray index; aliveness falls out of the
            # bundle-interval gather (intervals tile [0, total_iter)).
            ray_index = (jax.lax.rem(step, np.int32(chunks_per_iter))
                         * chunk + rows * sub + cols)
        else:
            ray_index = step * chunk + rows * sub + cols
            if poisson_rate is not None:
                alive = ray_index < seed_ref[2]
            else:
                alive = ray_index < n_total

        def count_into(elem, alive):
            c = jnp.sum(alive.astype(jnp.int32))
            crow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            ccol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            sel = ((crow == 0) & (ccol == elem)).astype(jnp.int32)
            counts_ref[:] += c * sel

        if is_plasma:
            # ---- plasma source: in-kernel bundle sampling ---------------
            # Interval-one-hot gather of the 8 per-bundle attributes
            # (origin xyz, spread, temperature, velocity xyz) — the
            # in-kernel twin of ops/bundle_gather.py. Bundles whose
            # interval covers this ray set matched=1; intervals tile
            # [0, total) contiguously, so matched == (ray < total).
            # The bundle axis is processed in static windows so the live
            # one-hot tile stays (W, sub) — the full (B_pad, sub) tile at
            # chunk 8192 overflows scoped VMEM.
            if plasma_windowed:
                # Transpose each lane-major cum page ONCE per chunk:
                # column k of the (128, rows) result holds bundles
                # [k*128, (k+1)*128) on SUBLANES — the orientation the
                # interval-one-hot compare needs.
                pages = [
                    (jnp.transpose(cpr[:], (1, 0)),
                     jnp.transpose(cr[:], (1, 0)), tr)
                    for cpr, cr, tr in plasma_pages
                ]
                windows = []
                for cpw, cw, tr in pages:
                    for k in range(cw.shape[1]):
                        windows.append(
                            (cpw[:, k:k + 1], cw[:, k:k + 1],
                             tr, k * 128, 128)
                        )
            else:
                B_loop = src["B_pad"]
                W = min(B_loop, 256)
                windows = [
                    (cum_prev_r[w0:w0 + W, :], cum_r[w0:w0 + W, :],
                     btable_r, w0, W)
                    for cum_prev_r, cum_r, btable_r in plasma_pages
                    for w0 in range(0, B_loop, W)
                ]
            acc = [jnp.zeros((8, sub), f32) for _ in range(8)]
            matched = jnp.zeros((8, sub), f32)
            for s in range(8):
                idxs = ray_index[s, :][None, :]  # (1, sub)
                val = jnp.zeros((8, sub), f32)
                m_s = jnp.zeros((1, sub), f32)
                for cum_prev_col, cum_col, btable_r, w0, W in windows:
                    oh = ((idxs >= cum_prev_col)
                          & (idxs < cum_col)).astype(f32)
                    val = val + jax.lax.dot_general(
                        btable_r[:, w0:w0 + W], oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )  # (8, sub)
                    m_s = m_s + jnp.sum(oh, axis=0)[None, :]
                sel = rows == s
                matched = matched + jnp.where(sel, m_s, 0.0)
                for k in range(8):
                    acc[k] = acc[k] + jnp.where(sel, val[k][None, :], 0.0)
            alive = (matched > 0.5) & (ray_index < N_budget)
            px, py, pz = acc[0], acc[1], acc[2]
            theta_b = acc[3]
            temp_b = acc[4]
            velx_b, vely_b, velz_b = acc[5], acc[6], acc[7]
            Bb = src["basis"]
            if src["voxel"] > 0.0:
                # Voxel offsets in the source frame (plasma.py voxel_off).
                h = src["voxel"]
                vx = (draw() - 0.5) * h
                vy = (draw() - 0.5) * h
                vz = (draw() - 0.5) * h
                px = px + vx * Bb[0][0] + vy * Bb[1][0] + vz * Bb[2][0]
                py = py + vx * Bb[0][1] + vy * Bb[1][1] + vz * Bb[2][1]
                pz = pz + vx * Bb[0][2] + vy * Bb[1][2] + vz * Bb[2][2]
            # Isotropic cone (per-ray half-angle) aimed at the target,
            # per-ray basis as vec.orthogonal_basis (plasma.py:338-351).
            tx_, ty_, tz_ = src["target"]
            nx_ = tx_ - px
            ny_ = ty_ - py
            nz_ = tz_ - pz
            inv = jax.lax.rsqrt(jnp.maximum(
                nx_ * nx_ + ny_ * ny_ + nz_ * nz_, 1e-30))
            nx_, ny_, nz_ = nx_ * inv, ny_ * inv, nz_ * inv
            hx = Bb[0][0] + Bb[2][0]
            hy = Bb[0][1] + Bb[2][1]
            hz = Bb[0][2] + Bb[2][2]
            o1x = ny_ * hz - nz_ * hy
            o1y = nz_ * hx - nx_ * hz
            o1z = nx_ * hy - ny_ * hx
            inv = jax.lax.rsqrt(jnp.maximum(
                o1x * o1x + o1y * o1y + o1z * o1z, 1e-30))
            o1x, o1y, o1z = o1x * inv, o1y * inv, o1z * inv
            o2x = ny_ * o1z - nz_ * o1y
            o2y = nz_ * o1x - nx_ * o1z
            o2z = nx_ * o1y - ny_ * o1x
            u, v = draw(), draw()
            lz = 1.0 - u * (1.0 - jnp.cos(theta_b))
            rho = jnp.sqrt(jnp.maximum(1.0 - lz * lz, 0.0))
            phi = v * (2.0 * math.pi)
            lx = rho * jnp.cos(phi)
            ly = rho * jnp.sin(phi)
            dx = lx * o2x + ly * o1x + lz * nx_
            dy = lx * o2y + ly * o1y + lz * ny_
            dz = lx * o2z + ly * o1z + lz * nz_
            # Exact Voigt: Gauss(Doppler sigma(T)) + Cauchy(gamma), then
            # bulk-velocity Doppler (plasma.py:353-366).
            wl = src["wavelength"] + src["sigma_conv"] * jnp.sqrt(
                jnp.maximum(temp_b, 0.0)) * normal_draw()
            if src["gamma"] > 0.0:
                uc = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
                wl = wl + src["gamma"] * jnp.tan(math.pi * (uc - 0.5))
            c_inv = 1.0 / 299792458.0
            wl = wl * (1.0 - (velx_b * dx + vely_b * dy
                              + velz_b * dz) * c_inv)
        else:
            # ---- source: position ------------------------------------------
            ox, oy, oz = src["origin"]
            B = src["basis"]
            if src["spatial"] == "point":
                px = jnp.full((8, sub), ox, f32)
                py = jnp.full((8, sub), oy, f32)
                pz = jnp.full((8, sub), oz, f32)
            else:
                offs = []
                for s in src["sizes"]:
                    if s == 0.0:
                        offs.append(None)
                    elif src["spatial"] == "uniform":
                        offs.append((draw() - 0.5) * s)
                    else:  # gaussian (s is already sigma)
                        offs.append(normal_draw() * s)
                px = jnp.full((8, sub), ox, f32)
                py = jnp.full((8, sub), oy, f32)
                pz = jnp.full((8, sub), oz, f32)
                for o_l, brow in zip(offs, B):
                    if o_l is not None:
                        px += o_l * brow[0]
                        py += o_l * brow[1]
                        pz += o_l * brow[2]

            # ---- source: direction (local z-aligned frame) ------------------
            dist = src["dist"]
            if dist[0] == "isotropic":
                cos_t = dist[1]
                u, v = draw(), draw()
                lz = cos_t + u * (1.0 - cos_t)
                rho = jnp.sqrt(jnp.maximum(1.0 - lz * lz, 0.0))
                phi = v * (2.0 * math.pi)
                lx = rho * jnp.cos(phi)
                ly = rho * jnp.sin(phi)
            elif dist[0] == "isotropic_xy":
                # Closed-form inverse CDF (ops/spread.py:107-143), symmetric-y.
                _, g0, g1, sb1, tyl, tyh = dist
                u, v = draw(), draw()
                sx = jnp.sin((g0 + u * (g1 - g0)) * 0.5) / sb1
                tx = sx * jax.lax.rsqrt(jnp.maximum(1.0 - sx * sx, 1e-12))
                k2 = 1.0 + tx * tx
                h0 = tyl * jax.lax.rsqrt(k2 + tyl * tyl)
                h1 = tyh * jax.lax.rsqrt(k2 + tyh * tyh)
                h = h0 + v * (h1 - h0)
                ty = jnp.sqrt(k2) * h * jax.lax.rsqrt(
                    jnp.maximum(1.0 - h * h, 1e-12)
                )
                w = jax.lax.rsqrt(1.0 + tx * tx + ty * ty)
                lx, ly, lz = tx * w, ty * w, w
            elif dist[0] == "isotropic_xy_asym":
                # Asymmetric y-bounds: bracket-clamped Newton on the
                # arcsin-difference marginal CDF (ops/spread.py:116-128), with
                # arcsin(x) = pi/2 - acos_kernel(x) (Mosaic has no asin/acos
                # lowering). 12 iterations match the XLA sampler's default.
                from xicsrt_tpu.ops.polynomials import acos_kernel

                _, sx0, sx1, sb0, sb1, g0, g1, tyl, tyh = dist

                def asin_k(x):
                    return math.pi / 2.0 - acos_kernel(
                        jnp.clip(x, -1.0, 1.0))

                u, v = draw(), draw()
                target = g0 + u * (g1 - g0)
                sx = sx0 + u * (sx1 - sx0)
                for _ in range(12):
                    gm = asin_k(sx * sb1) - asin_k(sx * sb0)
                    dg = sb1 * jax.lax.rsqrt(jnp.maximum(
                        1.0 - (sx * sb1) ** 2, 1e-12)) - sb0 * jax.lax.rsqrt(
                        jnp.maximum(1.0 - (sx * sb0) ** 2, 1e-12))
                    sx = jnp.clip(
                        sx - (gm - target) / jnp.maximum(dg, 1e-12), sx0, sx1)
                tx = sx * jax.lax.rsqrt(jnp.maximum(1.0 - sx * sx, 1e-12))
                k2 = 1.0 + tx * tx
                h0 = tyl * jax.lax.rsqrt(k2 + tyl * tyl)
                h1 = tyh * jax.lax.rsqrt(k2 + tyh * tyh)
                h = h0 + v * (h1 - h0)
                ty = jnp.sqrt(k2) * h * jax.lax.rsqrt(
                    jnp.maximum(1.0 - h * h, 1e-12)
                )
                w = jax.lax.rsqrt(1.0 + tx * tx + ty * ty)
                lx, ly, lz = tx * w, ty * w, w
            elif dist[0] == "flat":
                # r = tan(theta) sqrt(u) on the z=1 plane (ops/spread.py:157).
                r = dist[1] * jnp.sqrt(draw())
                phi = draw() * (2.0 * math.pi)
                w = jax.lax.rsqrt(1.0 + r * r)
                lx = jnp.cos(phi) * r * w
                ly = jnp.sin(phi) * r * w
                lz = w
            elif dist[0] == "flat_xy":
                _, t0, t1, t2, t3 = dist
                x = t0 + draw() * (t1 - t0)
                y = t2 + draw() * (t3 - t2)
                w = jax.lax.rsqrt(1.0 + x * x + y * y)
                lx, ly, lz = x * w, y * w, w
            else:  # flat_gaussian
                sig = dist[1]
                x = sig * normal_draw()
                y = sig * normal_draw()
                w = jax.lax.rsqrt(1.0 + x * x + y * y)
                lx, ly, lz = x * w, y * w, w

            if src["rot"] is not None:
                R = src["rot"]
                dx = lx * R[0][0] + ly * R[1][0] + lz * R[2][0]
                dy = lx * R[0][1] + ly * R[1][1] + lz * R[2][1]
                dz = lx * R[0][2] + ly * R[1][2] + lz * R[2][2]
            else:
                # Focused source: per-ray emission axis n = (target - p)/|.|,
                # per-ray basis o1 = cross(n, bx) + cross(n, bz), o2 = cross(n,
                # o1) (vec.orthogonal_basis / _XicsrtSourceGeneric.py:282-292).
                tx_, ty_, tz_ = src["target"]
                nx_ = tx_ - px
                ny_ = ty_ - py
                nz_ = tz_ - pz
                inv = jax.lax.rsqrt(jnp.maximum(
                    nx_ * nx_ + ny_ * ny_ + nz_ * nz_, 1e-30))
                nx_, ny_, nz_ = nx_ * inv, ny_ * inv, nz_ * inv
                hx = B[0][0] + B[2][0]
                hy = B[0][1] + B[2][1]
                hz = B[0][2] + B[2][2]
                o1x = ny_ * hz - nz_ * hy
                o1y = nz_ * hx - nx_ * hz
                o1z = nx_ * hy - ny_ * hx
                inv = jax.lax.rsqrt(jnp.maximum(
                    o1x * o1x + o1y * o1y + o1z * o1z, 1e-30))
                o1x, o1y, o1z = o1x * inv, o1y * inv, o1z * inv
                o2x = ny_ * o1z - nz_ * o1y
                o2y = nz_ * o1x - nx_ * o1z
                o2z = nx_ * o1y - ny_ * o1x
                dx = lx * o2x + ly * o1x + lz * nx_
                dy = lx * o2y + ly * o1y + lz * ny_
                dz = lx * o2z + ly * o1z + lz * nz_

            # ---- source: wavelength ----------------------------------------
            wave = src["wave"]
            if not per_ray_wl:
                wl = None
            else:
                if wave[0] == "mono":
                    wl = jnp.full((8, sub), wave[1], f32)
                elif wave[0] == "uniform":
                    wl = wave[1] + draw() * (wave[2] - wave[1])
                else:  # voigt: exact Gauss + Cauchy decomposition
                    _, w0_, sigma_, gamma_ = wave
                    wl = jnp.full((8, sub), w0_, f32)
                    if sigma_ > 0.0:
                        wl = wl + sigma_ * normal_draw()
                    if gamma_ > 0.0:
                        uc = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
                        wl = wl + gamma_ * jnp.tan(math.pi * (uc - 0.5))
                if src["velocity"] is not None:
                    vx_, vy_, vz_ = src["velocity"]
                    c_inv = 1.0 / 299792458.0
                    wl = wl * (1.0 - (vx_ * dx + vy_ * dy + vz_ * dz) * c_inv)

            # Position-based ray filters (generate_rays applies filters
            # last, _XicsrtSourceGeneric.py:198-227; position-only tests
            # commute with the rest of sampling).
            for fspec in src["filters"]:
                # sightline: keep origins within radius of the cylinder
                # along the filter z-axis (filters/sightline.py:51-58).
                fox, foy, foz = fspec["origin"]
                fzx, fzy, fzz = fspec["zaxis"]
                lx_ = fox - px
                ly_ = foy - py
                lz_ = foz - pz
                proj = lx_ * fzx + ly_ * fzy + lz_ * fzz
                ex_ = lx_ - proj * fzx
                ey_ = ly_ - proj * fzy
                ez_ = lz_ - proj * fzz
                d2_ = ex_ * ex_ + ey_ * ey_ + ez_ * ez_
                alive = alive & (d2_ <= fspec["radius"] ** 2)

        if keep_meta:
            count_into(0, alive)

        # ---- optic chain (shared with the trace-only kernel) -----------
        wt = None if mode == "mc" else jnp.ones((8, sub), f32)
        if S_hist:
            final_alive = [None]

            def record(ei, px_, py_, pz_, dx_, dy_, dz_, wl_, alive_, wt_):
                base = ei * n_fields
                hist_scratch[base + 0] = px_
                hist_scratch[base + 1] = py_
                hist_scratch[base + 2] = pz_
                hist_scratch[base + 3] = dx_
                hist_scratch[base + 4] = dy_
                hist_scratch[base + 5] = dz_
                hist_scratch[base + 6] = (
                    wl_ if wl_ is not None
                    else jnp.full((8, sub), src["wavelength"], f32)
                )
                hist_scratch[base + 7] = alive_.astype(f32)
                if mode == "weight":
                    hist_scratch[base + 8] = (
                        wt_ if wt_ is not None else jnp.ones((8, sub), f32)
                    )
                final_alive[0] = alive_  # last call = final element

            record(0, px, py, pz, dx, dy, dz, wl, alive, wt)
        else:
            record = None
        _trace_chain(optics, sub, keep_meta, keep_images, draw,
                     count_into, image_refs, table_refs, px, py, pz,
                     dx, dy, dz, wl, alive, wt=wt, mode=mode,
                     image_mode=image_mode, record=record)
        if S_hist:
            # Reservoir write: in 'found' mode a chunk whose FINAL element
            # keeps at least one ray claims the next free HBM slot; in
            # 'sampled' mode every chunk claims one until the reservoir is
            # full (sequential TPU grid: the SMEM slot counter is
            # race-free). counts[1, 0] publishes the used-slot count.
            cnt_found = jnp.sum(final_alive[0].astype(jnp.int32))
            slot = slot_ref[0]
            want = (cnt_found > 0) if history_mode == "found" else (
                cnt_found > -1)

            @pl.when(want & (slot < S_hist))
            def _write_hist():
                cp = pltpu.make_async_copy(
                    hist_scratch, hist_ref.at[slot], dma_sem
                )
                cp.start()
                cp.wait()
                slot_ref[0] = slot + 1
                crow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                ccol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                counts_ref[:] += ((crow == 1) & (ccol == 0)).astype(
                    jnp.int32
                )

    out_shapes = [jax.ShapeDtypeStruct((8, 128), jnp.int32)]
    out_specs = [pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                              memory_space=pltpu.VMEM)]
    for _, im in images:
        acc_shape = _image_acc_shape(im, image_mode)
        out_shapes.append(jax.ShapeDtypeStruct(acc_shape, f32))
        out_specs.append(
            pl.BlockSpec(acc_shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    scratch_shapes = []
    if S_hist:
        # Reservoir buffer stays in HBM; slots are DMA'd from the VMEM
        # mirror on demand.
        out_shapes.append(
            jax.ShapeDtypeStruct((S_hist, n_hist_rows, 8, sub), f32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes += [
            pltpu.VMEM((n_hist_rows, 8, sub), f32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if rng == "input":
        in_specs.append(
            pl.BlockSpec((None, n_draws, 8, sub), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    if is_plasma:
        B_pad = src["B_pad"]
        cpi = chunks_per_iter
        if plasma_windowed:
            # Two consecutive PAGES of each per-iteration table, selected
            # by the scalar-prefetched per-chunk page index (the same
            # array is passed twice with different block mappings). Cum
            # arrays are packed LANE-major as (rows, 128) — the naive
            # (P, 1) column layout lane-pads every block to 128x its
            # logical size (2 MB/page) and blows the scoped-VMEM budget;
            # the kernel transposes each 16 KB page block once per chunk.
            P = src["page"]
            for _arr in range(2):  # cum_prev, cum
                for pg_off in (0, 1):
                    in_specs.append(pl.BlockSpec(
                        (None, P // 128, 128),
                        lambda i, pg, o=pg_off: (i // cpi, pg[i] + o, 0),
                        memory_space=pltpu.VMEM,
                    ))
            for pg_off in (0, 1):
                in_specs.append(pl.BlockSpec(
                    (None, 8, P),
                    lambda i, pg, o=pg_off: (i // cpi, 0, pg[i] + o),
                    memory_space=pltpu.VMEM,
                ))
        else:
            # Per-iteration bundle tables, selected by the grid index map
            # — zero per-chunk cost beyond the (tiny) block DMA.
            in_specs.append(
                pl.BlockSpec((None, B_pad, 1), lambda i, *_: (i // cpi, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            in_specs.append(
                pl.BlockSpec((None, B_pad, 1), lambda i, *_: (i // cpi, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            in_specs.append(
                pl.BlockSpec((None, 8, B_pad), lambda i, *_: (i // cpi, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        bundle_tables = pipeline.source.make_bundle_tables(
            getattr(pipeline, "source_filter_fns", None)
        )
        src_params = pipeline.params["sources"][pipeline.source.name]
        filter_params = pipeline.params["filters"]
    for tab in tables:
        in_specs.append(
            pl.BlockSpec(tab.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    # Off-chip: 'input' mode uses no TPU PRNG primitives, so the plain
    # interpreter suffices — and unlike InterpretParams it composes
    # with shard_map on a virtual CPU mesh (InterpretParams deadlocks
    # there). 'hw' off-chip needs InterpretParams' PRNG emulation.
    interp = (
        (True if rng == "input" else pltpu.InterpretParams())
        if interpret else False
    )
    if plasma_windowed:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shapes,
            # The default 16 MiB scoped budget undercounts reuse of the
            # unrolled gather's one-hot tiles; measured need at chunk
            # 2048 is ~22 MiB (v5e VMEM is 128 MiB).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interp,
        )
    else:
        call = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            interpret=interp,
        )

    element_names = pipeline.element_names
    image_names = [optics[i]["name"] for i, _ in images]
    image_dims = [(im["nx"], im["ny"]) for _, im in images]

    @jax.jit
    def run(key):
        seed = jax.random.randint(
            key, (2,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        )
        if poisson_rate is not None:
            cnt = jnp.minimum(
                jax.random.poisson(jax.random.fold_in(key, 7919),
                                   poisson_rate),
                n_total,
            ).astype(jnp.int32)
        else:
            cnt = jnp.asarray(n_total, dtype=jnp.int32)
        seed = jnp.concatenate([seed, cnt[None]])
        plasma_args = []
        if is_plasma:
            # O(bundle_count) stage in XLA, per iteration — same key
            # discipline as the XLA engine's generate (split 7, first 3).
            B, B_pad_ = src["B"], src["B_pad"]
            cps, cs, ts, b_los = [], [], [], []
            for j_key in jax.random.split(key, num_iter):
                ks = jax.random.split(j_key, 7)
                cum, btab, _tot = bundle_tables(
                    src_params, filter_params, ks[0], ks[1], ks[2]
                )
                if plasma_windowed:
                    # Stable-partition zero-count bundles to the back so
                    # any `chunk` consecutive rays span <= chunk+1 table
                    # rows — the page-pair coverage guarantee. Empty
                    # intervals [c, c) never match, so attribute values
                    # of moved bundles are irrelevant.
                    counts = cum - jnp.concatenate(
                        [jnp.zeros((1,), cum.dtype), cum[:-1]]
                    )
                    order = jnp.argsort((counts == 0).astype(jnp.int32))
                    counts = counts[order]
                    btab = btab[order]
                    cum = jnp.cumsum(counts)
                    P_ = src["page"]
                    n_pages = B_pad_ // P_
                    r0s = jnp.arange(cpi, dtype=jnp.int32) * chunk
                    idx = jnp.searchsorted(
                        cum, r0s, side="right"
                    ).astype(jnp.int32)
                    b_los.append(jnp.clip(idx // P_, 0, n_pages - 2))
                cum_prev = jnp.concatenate(
                    [jnp.zeros((1,), cum.dtype), cum[:-1]]
                )
                if plasma_windowed:
                    # Lane-major packing b = row*128 + lane (see in_specs).
                    cps.append(jnp.zeros((B_pad_,), jnp.int32)
                               .at[:B].set(cum_prev)
                               .reshape(B_pad_ // 128, 128))
                    cs.append(jnp.zeros((B_pad_,), jnp.int32)
                              .at[:B].set(cum)
                              .reshape(B_pad_ // 128, 128))
                else:
                    cps.append(jnp.zeros((B_pad_, 1), jnp.int32)
                               .at[:B, 0].set(cum_prev))
                    cs.append(jnp.zeros((B_pad_, 1), jnp.int32)
                              .at[:B, 0].set(cum))
                ts.append(jnp.zeros((8, B_pad_), jnp.float32)
                          .at[:, :B].set(btab.T))
            cp_all = jnp.stack(cps)
            c_all = jnp.stack(cs)
            t_all = jnp.stack(ts)
            if plasma_windowed:
                # Pass each table twice (page-0 and page-1 block specs);
                # the page array rides the scalar-prefetch slot.
                prefetch_args = [jnp.stack(b_los).reshape(-1)]
                plasma_args = [cp_all, cp_all, c_all, c_all, t_all, t_all]
            else:
                plasma_args = [cp_all, c_all, t_all]
        table_args = [jnp.asarray(t) for t in tables]
        prefetch = prefetch_args if plasma_windowed else []
        if rng == "input":
            uniforms = jax.random.uniform(
                key, (n_chunks, n_draws, 8, sub), dtype=f32
            )
            outs = call(*prefetch, seed, uniforms, *plasma_args,
                        *table_args)
        else:
            outs = call(*prefetch, seed, *plasma_args, *table_args)
        if S_hist:
            counts, *imgs, hist = outs
        else:
            counts, *imgs = outs
        meta = (
            {name: counts[0, i] for i, name in enumerate(element_names)}
            if keep_meta else {}
        )
        image = {
            name: _image_unpack(img, nx, ny, image_mode)
            for name, (nx, ny), img in zip(image_names, image_dims, imgs)
        }
        history = {}
        if S_hist:
            from xicsrt_tpu.rays import Rays

            slots_used = counts[1, 0]
            valid_ray = jnp.repeat(
                jnp.arange(S_hist, dtype=jnp.int32) < slots_used, chunk
            )

            def elem_rays(ei):
                base = ei * n_fields

                def fl(k):
                    # Slots past slots_used were never DMA'd: zero every
                    # field there, not just the mask, so consumers that
                    # reduce over full arrays never see uninitialized HBM.
                    return jnp.where(
                        valid_ray, hist[:, base + k].reshape(-1), 0.0
                    )

                return Rays(
                    origin=jnp.stack([fl(0), fl(1), fl(2)], axis=1),
                    direction=jnp.stack([fl(3), fl(4), fl(5)], axis=1),
                    wavelength=fl(6),
                    weight=(fl(8) if mode == "weight"
                            else jnp.ones((S_hist * chunk,), f32)),
                    mask=(fl(7) != 0.0) & valid_ray,
                )

            history = {
                name: elem_rays(i) for i, name in enumerate(element_names)
            }
        return {"meta": meta, "image": image, "history": history}

    return run


def build_fused_trace_run(pipeline, num_iter: int | None = None,
                          chunk: int = 8192, interpret: bool = False,
                          rng: str | None = None):
    """Hybrid fast path: XLA ray generation + fused Pallas trace kernel.

    Sources outside the megakernel subset (plasma bundles, filtered or
    asymmetric sources) generate rays with the general XLA ``generate``
    into HBM; this kernel then streams ray chunks through the SAME shared
    optic chain (``_trace_chain``) with zero intermediate HBM traffic. The
    stream costs ~32 B/ray of HBM reads — a ~1e10 rays/s roof at v5e
    bandwidth, far above the XLA engine's fusion-boundary-limited ~6e8.

    Geometry is baked in at build; generation parameters are captured from
    ``pipeline.params``. Returns ``run(key)`` like :func:`build_fused_run`.
    """
    g = pipeline.general
    mode = str(g.get("interact_mode", "mc")).lower()
    if mode not in ("mc", "weight"):
        raise FusedUnsupported(f"interact_mode {mode!r}")
    image_mode = str(g.get("image_mode", "nearest")).lower()
    if image_mode not in ("nearest", "bilinear"):
        raise FusedUnsupported(f"image_mode {image_mode!r}")
    if str(g.get("dtype", "float32")).lower() not in ("float32", "f32"):
        raise FusedUnsupported("dtype != float32")

    # Weight mode streams the generator's per-ray weights too (sources
    # emit unit weights, so mc mode skips the extra 4 B/ray of traffic).
    n_ray_refs = 9 if mode == "weight" else 8
    optics = [_optic_spec(o, 0.0, True, mode) for o in pipeline.optics]
    tables = _collect_tables(optics)
    if num_iter is None:
        num_iter = int(g["number_of_iter"])
    N = pipeline.num_rays  # static per-iteration budget
    if N * num_iter >= 2**31:
        raise FusedUnsupported("ray count overflows int32 indexing")
    n_chunks = -(-N // chunk)
    n_pad = n_chunks * chunk
    sub = chunk // 8
    if chunk % (8 * 128) != 0:
        raise ValueError("chunk must be a multiple of 1024")

    images = [(i, o["image"]) for i, o in enumerate(optics) if o["image"]]
    keep_meta = bool(g.get("keep_meta", True))
    keep_images = bool(g.get("keep_images", True))
    if not keep_images:
        images = []
    if rng is None:
        rng = "input" if interpret else "hw"
    n_draws = sum(o.get("n_draws", 0) for o in optics)

    f32 = jnp.float32

    def kernel(seed_ref, *refs):
        ray_refs = refs[:n_ray_refs]
        rest = list(refs[n_ray_refs:])
        if rng == "input" and n_draws > 0:
            rng_ref, *rest = rest
        table_refs = rest[:len(tables)]
        counts_ref, *image_refs = rest[len(tables):]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            counts_ref[:] = jnp.zeros_like(counts_ref)
            for ref in image_refs:
                ref[:] = jnp.zeros_like(ref)

        if rng == "hw":
            pltpu.prng_seed(seed_ref[0], seed_ref[1] + step * (-1640531535))

        draw_slot = [0]

        def draw():
            if rng == "input":
                k = draw_slot[0]
                draw_slot[0] += 1
                return rng_ref[k]
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((8, sub)), jnp.int32
            )
            return (bits & 0x00FFFFFF).astype(f32) * (1.0 / (1 << 24))

        def count_into(elem, alive):
            c = jnp.sum(alive.astype(jnp.int32))
            crow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            ccol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            sel = ((crow == 0) & (ccol == elem)).astype(jnp.int32)
            counts_ref[:] += c * sel

        px, py, pz = ray_refs[0][:], ray_refs[1][:], ray_refs[2][:]
        dx, dy, dz = ray_refs[3][:], ray_refs[4][:], ray_refs[5][:]
        wl = ray_refs[6][:]
        alive = ray_refs[7][:] != 0
        wt = ray_refs[8][:] if mode == "weight" else None
        if keep_meta:
            count_into(0, alive)
        _trace_chain(optics, sub, keep_meta, keep_images, draw,
                     count_into, image_refs, table_refs, px, py, pz,
                     dx, dy, dz, wl, alive, wt=wt, mode=mode,
                     image_mode=image_mode)

    out_shapes = [jax.ShapeDtypeStruct((8, 128), jnp.int32)]
    out_specs = [pl.BlockSpec((8, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]
    for _, im in images:
        acc_shape = _image_acc_shape(im, image_mode)
        out_shapes.append(jax.ShapeDtypeStruct(acc_shape, f32))
        out_specs.append(
            pl.BlockSpec(acc_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    ray_spec = pl.BlockSpec((None, 8, sub), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [ray_spec] * n_ray_refs)
    if rng == "input" and n_draws > 0:
        in_specs.append(
            pl.BlockSpec((None, n_draws, 8, sub), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    for tab in tables:
        in_specs.append(
            pl.BlockSpec(tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    call = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=(
            (True if rng == "input" else pltpu.InterpretParams())
            if interpret else False
        ),
    )

    element_names = pipeline.element_names
    image_names = [optics[i]["name"] for i, _ in images]
    image_dims = [(im["nx"], im["ny"]) for _, im in images]
    generate = pipeline.generate
    source_name = pipeline.source.name
    params = pipeline.params

    def one_iteration(k):
        k_src, k_kernel = jax.random.split(k)
        rays = generate(params["sources"][source_name], params["filters"],
                        k_src)

        def flat(a, fill=0):
            a = jnp.pad(a, (0, n_pad - N), constant_values=fill)
            return a.reshape(n_chunks, 8, sub)

        args = [
            flat(rays.origin[:, 0]), flat(rays.origin[:, 1]),
            flat(rays.origin[:, 2]),
            flat(rays.direction[:, 0]), flat(rays.direction[:, 1]),
            flat(rays.direction[:, 2]),
            flat(rays.wavelength),
            flat(rays.mask.astype(jnp.int32)),
        ]
        if mode == "weight":
            args.append(flat(rays.weight))
        seed = jax.random.randint(
            k_kernel, (2,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        )
        table_args = [jnp.asarray(t) for t in tables]
        if rng == "input" and n_draws > 0:
            uniforms = jax.random.uniform(
                k_kernel, (n_chunks, n_draws, 8, sub), dtype=f32
            )
            return call(seed, *args, uniforms, *table_args)
        return call(seed, *args, *table_args)

    @jax.jit
    def run(key):
        keys = jax.random.split(key, num_iter)
        outs = one_iteration(keys[0])
        if num_iter > 1:
            def body(carry, k):
                new = one_iteration(k)
                return tuple(c + n for c, n in zip(carry, new)), None

            outs, _ = jax.lax.scan(body, tuple(outs), keys[1:])
        counts, *imgs = outs
        meta = (
            {name: counts[0, i] for i, name in enumerate(element_names)}
            if keep_meta else {}
        )
        image = {
            name: _image_unpack(img, nx, ny, image_mode)
            for name, (nx, ny), img in zip(image_names, image_dims, imgs)
        }
        return {"meta": meta, "image": image, "history": {}}

    return run


def build_fast_run(pipeline, num_iter: int | None = None,
                   interpret: bool = False, chunk: int | None = None,
                   history_slots: int | None = None,
                   history_mode: str = "found"):
    """Fastest applicable Pallas path for a pipeline.

    Tries the single-megakernel engine first (zero HBM traffic; plasma
    sources run in-kernel up to 4096 bundles), falling back to the hybrid
    XLA-generate + fused-trace kernel when only the SOURCE is outside the
    megakernel subset (ray-filtered sources, >4096 bundles). Raises
    ``FusedUnsupported`` when the optic chain itself is unsupported
    (faceted/rough meshes).

    ``history_slots``: enable the found-ray history reservoir
    (megakernel only — the hybrid path raises ``FusedUnsupported`` when
    history is requested).

    Returns ``(run, kind)`` with kind in {"fused", "fused_trace"}.
    """
    kwargs = {} if chunk is None else {"chunk": chunk}
    try:
        return (build_fused_run(pipeline, num_iter=num_iter,
                                interpret=interpret,
                                history_slots=history_slots,
                                history_mode=history_mode, **kwargs),
                "fused")
    except FusedUnsupported:
        if history_slots or history_mode == "sampled":
            raise FusedUnsupported(
                "history reservoir requires the megakernel path"
            )
    return (build_fused_trace_run(pipeline, num_iter=num_iter,
                                  interpret=interpret, **kwargs),
            "fused_trace")
