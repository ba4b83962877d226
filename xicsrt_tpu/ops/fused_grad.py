"""Fused forward+backward trace kernels (Pallas TPU): in-kernel gradients.

The XLA differentiable path tops out at ~2.1e8 rays/s fwd+bwd on one v5e
chip — the bandwidth roofline of reverse-mode over an HBM-bound forward
(docs/performance.md). This module removes HBM from the loop: one Pallas
kernel runs the weight-mode forward, and a twin kernel re-generates the
SAME rays (same per-chunk PRNG seeds) and runs a HAND-DERIVED adjoint
sweep, accumulating parameter gradients on-chip. Per-ray state — primal
and adjoint — lives only in VMEM/registers.

Differentiated parameters enter through SMEM at RUN time (not baked like
``build_fused_run``'s geometry), so an optimization loop updates them
without recompiling: per optic, origin (3), basis rows (9), radius
(radius_major for tori), crystal_spacing, rocking_fwhm, reflectivity,
radius_minor — the full pose+physics set of the reference's alignment
problem (``_InteractCrystal.py:96-196``, ``_GeometryObject.py:137-168``,
``_ShapeTorus.py:136-183``).

Supported subset (``FusedGradUnsupported`` otherwise):

- source: Generic/Directed/Focused, point / uniform / gaussian spatial,
  isotropic / isotropic_xy (incl. asymmetric) / flat / flat_xy /
  gaussian angular, monochrome / uniform-band / exact-Voigt
  wavelengths, bulk-velocity Doppler, counted (non-Poisson) budget —
  generic-source sampling carries no parameter dependence
  (reparameterized MC, matching the XLA path's semantics); plasma
  sources additionally differentiate emissivity and temperature;
- optics: chains of plane/sphere/cylinder/torus shapes (the torus root
  converges on stop-gradient copies and differentiates through ONE
  explicit Newton correction — the implicit-function adjoint) with
  none/mirror/crystal/mosaic interactions, gaussian / step /
  measured-file rocking curves (file curves as static tent-matvec
  tables: gradients flow through the interpolation argument into pose
  and d-spacing), mosaic crystals via the depth-aware survival
  estimator (per-layer crystallite normals differentiate through the
  macroscopic normal; the reservoir pick indicator is a hard edge, as
  in jax.grad of the XLA estimator), x/y/z size bounds and aperture
  masks (hard edges carry zero gradient — the standard
  differentiable-MC approximation, same as the XLA path), bilinear
  images on any optics;
- ``interact_mode='weight'``, float32.

Correctness strategy: the forward and backward are PURE-JNP functions
(`_trace_fwd` / `_trace_bwd`) shared verbatim by the kernels and by a
CPU-side replica; ``tests/test_fused_grad.py`` checks the hand-written
adjoints against ``jax.grad`` of the replica on identical uniforms
(exact, not statistical), then runs the kernels under the interpreter
against the same replica.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xicsrt_tpu.ops.fused_trace import (
    FusedUnsupported,
    _f,
    _round_up,
    _v3,
)


class FusedGradUnsupported(FusedUnsupported):
    """Config outside the fused-gradient subset."""


SLOTS_PER_OPTIC = 24
# Slot layout per optic (base = 24 * i):
#   0:3  origin   3:6  bx   6:9  by   9:12  bz
#   12 radius (radius_major for torus)   13 crystal_spacing
#   14 rocking_fwhm   15 reflectivity   16 radius_minor   17:24 reserved
# The flat gradient vector is harvested from an (8, 128) accumulator,
# slot j living at (j // 128, j % 128): up to 1024 slots = 42 optics.
_EPS = 1e-12


# ---------------------------------------------------------------------------
# Build-time spec extraction (static structure; differentiated values come
# from the params vector at run time).
# ---------------------------------------------------------------------------

def _grad_source_spec(source):
    """Restrict the megakernel's source spec to the gradient subset.

    Reusing ``fused_trace._source_spec`` guarantees the SAME sampling
    conventions (draw order, closed forms) the megakernel validates
    against the XLA engine."""
    from xicsrt_tpu.ops.fused_trace import _source_spec
    from xicsrt_tpu.sources.plasma import PlasmaGeneric

    if isinstance(source, PlasmaGeneric):
        return _grad_plasma_spec(source)
    filters = source.param.get("filters")
    if filters is not None and len(filters) > 0:
        raise FusedGradUnsupported("ray-filtered source")
    spec = _source_spec(source, {})
    if spec["poisson"]:
        # A Poisson ray count is not reparameterizable (the budget is
        # integer); the XLA path keeps its count-based semantics.
        raise FusedGradUnsupported("Poisson budget (use counted intensity)")
    if spec["dist"][0] not in ("isotropic", "isotropic_xy",
                               "isotropic_xy_asym", "flat",
                               "flat_xy", "flat_gaussian"):
        raise FusedGradUnsupported(f"angular_dist {spec['dist'][0]!r}")
    spec["intensity"] = int(source.num_rays)
    return spec


# Source slot block appended AFTER the optic blocks (plasma sources):
#   src_base = n_optics * SLOTS_PER_OPTIC
#   src_base + 0  emissivity   src_base + 1  temperature   2:8 reserved
SRC_SLOTS = 8


def _grad_plasma_spec(source):
    """Plasma sources in the gradient subset: CONSTANT profiles
    (PlasmaGeneric/PlasmaCubic), counted budget, constant cone spread.

    d(image)/d(emissivity, temperature) — the scientific payoff of a
    differentiable XICS code (fitting measured spectra against profile
    parameters; ``_XicsrtPlasmaGeneric.py:269-320`` real-units
    semantics) — runs in-kernel: emissivity enters each ray's WEIGHT
    (w0 = expected_photons(E)/n_rays, exact linear-rate derivative —
    the XLA engine's integer photon counts carry no gradient at all),
    temperature enters the Doppler width by reparameterization
    (lambda = lambda0 + sigma(T) * n with n a fixed standard normal).

    Sampling is the bundle_count -> n_rays limit of the bundle picture
    (one fresh bundle per ray): for constant profiles the MEAN image is
    identical for every bundle_count, with strictly less clustering
    variance.
    """
    from xicsrt_tpu.sources.plasma import PlasmaCubic, PlasmaGeneric

    if type(source) not in (PlasmaGeneric, PlasmaCubic):
        raise FusedGradUnsupported(
            "plasma with non-constant profiles (XLA path only)"
        )
    p = source.param
    filters = p.get("filters")
    if filters is not None and len(filters) > 0:
        raise FusedGradUnsupported("ray-filtered plasma")
    if bool(p["use_poisson"]):
        raise FusedGradUnsupported("Poisson budget (set use_poisson=False)")
    if p.get("spread") is None:
        raise FusedGradUnsupported("spread_radius plasma (use a constant "
                                   "spread)")
    velocity = np.asarray(p["velocity"], dtype=np.float64).reshape(3)

    frame = source.frame
    basis = np.asarray(frame.basis, dtype=np.float64)
    spread = float(p["spread"])
    omega = 4.0 * math.pi * math.sin(spread / 2.0) ** 2
    E0 = float(p["emissivity"])
    T0 = float(p["temperature"])
    if E0 <= 0.0:
        raise FusedGradUnsupported("emissivity must be positive")
    expected = (E0 * float(p["time_resolution"]) * float(p["volume"])
                * omega / (4.0 * math.pi)
                * float(p["intensity_scale"]))
    n_rays = max(int(round(expected)), 1)
    w0 = float(p["wavelength"])
    # sigma(T) = sigma_conv * sqrt(T) (plasma.py Doppler formula).
    sigma_conv = math.sqrt(
        1.602176634e-19
        / (float(p["mass_number"]) * 1.66053906892e-27 * 299792458.0 ** 2)
    ) * w0
    voxel = float(source.voxel_size)
    sizes = tuple(float(p[k]) for k in ("xsize", "ysize", "zsize"))
    n_draws = (sum(1 for s in sizes if s != 0.0)
               + (3 if voxel > 0.0 else 0)
               + 2                      # cone direction
               + 1                      # gaussian (erf_inv)
               + (1 if source.gamma > 0.0 else 0))
    return {
        "kind": "plasma",
        "origin": _v3(frame.origin),
        "basis": tuple(_v3(r) for r in basis),
        "sizes": sizes,
        "voxel": voxel,
        "target": _v3(np.asarray(p["target"], dtype=np.float64)),
        "cos_spread": math.cos(spread),
        "wavelength": w0,
        "sigma_conv": float(sigma_conv),
        "gamma": float(source.gamma),
        "velocity": (_v3(velocity) if np.any(velocity != 0.0) else None),
        "E0": E0,
        "T0": T0,
        "w0_base": expected / n_rays,
        "intensity": n_rays,
        "n_draws": n_draws,
    }


def _sample_plasma(src, draw, sub, P, src_base, f32=jnp.float32):
    """Per-ray plasma sampling (the megakernel's plasma formulas in the
    one-bundle-per-ray limit). Returns
    ``(px, py, pz, dx, dy, dz, lam, w0, aux)`` with ``aux`` carrying the
    primals the source-slot adjoint needs."""
    ox, oy, oz = src["origin"]
    B = src["basis"]
    px = jnp.full((8, sub), ox, f32)
    py = jnp.full((8, sub), oy, f32)
    pz = jnp.full((8, sub), oz, f32)
    for s_, brow in zip(src["sizes"], B):
        if s_ != 0.0:
            o_l = (draw() - 0.5) * s_
            px += o_l * brow[0]
            py += o_l * brow[1]
            pz += o_l * brow[2]
    if src["voxel"] > 0.0:
        h = src["voxel"]
        for brow in B:
            o_l = (draw() - 0.5) * h
            px += o_l * brow[0]
            py += o_l * brow[1]
            pz += o_l * brow[2]
    # Isotropic cone aimed at the target; per-ray orthogonal basis
    # (fused_trace focused-source block / vec.orthogonal_basis).
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
    u, v = draw(), draw()
    lz = 1.0 - u * (1.0 - src["cos_spread"])
    rho = jnp.sqrt(jnp.maximum(1.0 - lz * lz, 0.0))
    phi = v * (2.0 * math.pi)
    lx = rho * jnp.cos(phi)
    ly = rho * jnp.sin(phi)
    dx = lx * o2x + ly * o1x + lz * nx_
    dy = lx * o2y + ly * o1y + lz * ny_
    dz = lx * o2z + ly * o1z + lz * nz_
    # Exact Voigt wavelength with the DIFFERENTIATED temperature slot:
    # lambda = (lambda0 + sigma(T) n + gamma c) * doppler, n and c fixed
    # draws (reparameterization).
    T = P[src_base + 1]
    E = P[src_base + 0]
    u_g = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
    n_g = math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u_g - 1.0)
    sqrtT = jnp.sqrt(jnp.maximum(T, 1e-30))
    lam = src["wavelength"] + src["sigma_conv"] * sqrtT * n_g
    if src["gamma"] > 0.0:
        uc = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
        lam = lam + src["gamma"] * jnp.tan(math.pi * (uc - 0.5))
    if src["velocity"] is not None:
        vx_, vy_, vz_ = src["velocity"]
        dop = 1.0 - (vx_ * dx + vy_ * dy + vz_ * dz) * (
            1.0 / 299792458.0)
    else:
        dop = jnp.ones_like(lam)
    lam = lam * dop
    w0 = (src["w0_base"] / src["E0"]) * E + jnp.zeros_like(px)
    aux = {"n_g": n_g, "sqrtT": sqrtT, "dop": dop}
    return px, py, pz, dx, dy, dz, lam, w0, aux


def _source_slot_grads(src, src_base, wb, lamb, aux):
    """Map the sweep's terminal adjoints (dL/d w0 per ray, dL/d lambda
    per ray) onto the source parameter slots."""
    out = {}
    if src.get("kind") != "plasma":
        return out
    # w0 = (w0_base / E0) * E
    out[src_base + 0] = wb * (src["w0_base"] / src["E0"])
    # lambda = (lambda0 + sigma_conv sqrt(T) n + ...) * dop
    dlam_dT = (src["sigma_conv"] * aux["n_g"] * aux["dop"]
               / (2.0 * aux["sqrtT"]))
    out[src_base + 1] = lamb * dlam_dT
    return out


def _grad_optic_spec(optic):
    from xicsrt_tpu.optics import composites as C
    from xicsrt_tpu.optics.base import TraceElement

    if not isinstance(optic, TraceElement):
        raise FusedGradUnsupported(type(optic).__name__)
    cname = type(optic).__name__
    p = optic.param

    if isinstance(optic, (C.OpticDetector, C.OpticAperture)):
        shape, interact = "plane", "none"
    elif isinstance(optic, C.OpticPlanarMirror):
        shape, interact = "plane", "mirror"
    elif isinstance(optic, C.OpticPlanarCrystal):
        shape, interact = "plane", "crystal"
    elif isinstance(optic, C.OpticSphericalMirror):
        shape, interact = "sphere", "mirror"
    elif isinstance(optic, C.OpticSphericalCrystal):
        shape, interact = "sphere", "crystal"
    elif isinstance(optic, C.OpticCylindricalMirror):
        shape, interact = "cylinder", "mirror"
    elif isinstance(optic, C.OpticCylindricalCrystal):
        shape, interact = "cylinder", "crystal"
    elif isinstance(optic, C.OpticToroidalMirror):
        shape, interact = "torus", "mirror"
    elif isinstance(optic, C.OpticToroidalCrystal):
        shape, interact = "torus", "crystal"
    elif isinstance(optic, C.OpticPlanarMosaicCrystal):
        shape, interact = "plane", "mosaic"
    elif isinstance(optic, C.OpticSphericalMosaicCrystal):
        shape, interact = "sphere", "mosaic"
    else:
        raise FusedGradUnsupported(cname)

    spec = {
        "name": optic.name,
        "shape": shape,
        "interact": interact,
        "convex": (bool(p.get("convex"))
                   if shape in ("sphere", "cylinder") else False),
        "check_size": bool(p.get("check_size", True)),
        "xsize": _f(p.get("xsize") or 0.0),
        "ysize": _f(p.get("ysize") or 0.0),
        "zsize": _f(p.get("zsize") or 0.0),
        "apertures": [],
        "image": None,
        "rocking": None,
    }
    if shape == "torus":
        # convex-flag pair folded into (major_adjust, center_sign) at
        # initialize (optics/shapes.py ShapeTorus.initialize).
        spec["major_adjust"] = _f(p["major_adjust"])
        spec["center_sign"] = _f(p["center_sign"])
    if interact == "mosaic":
        # HOPG mosaic model (_InteractMosaicCrystal.py:53-139): the
        # weight-mode depth-aware survival estimator with reservoir
        # layer selection, as in the megakernel/XLA paths; 3 uniforms
        # per layer (2 crystallite normal, 1 reservoir pick).
        depth = int(p["mosaic_depth"])
        spread = _f(p["mosaic_spread"])
        hwhm = spread / 2.0
        spec["mosaic"] = {
            "depth": depth,
            "sigma_n": math.sin(hwhm / math.sqrt(2.0 * math.log(2.0))),
            "cutoff_angle": (
                math.sqrt(-math.log(_f(p["mosaic_cutoff"])) * 2.0)
                * spread / (2.0 * math.sqrt(2.0 * math.log(2.0)))
                if p.get("mosaic_cutoff") is not None else None),
        }
        spec["n_draws"] = 3 * depth
    if interact in ("crystal", "mosaic"):
        if not bool(p.get("check_bragg", True)):
            raise FusedGradUnsupported("check_bragg=False crystal")
        rtype = str(p.get("rocking_type", "gaussian")).lower()
        if rtype not in ("gaussian", "step", "file"):
            raise FusedGradUnsupported(f"rocking_type {rtype}")
        spec["rocking"] = {"type": rtype}
        if rtype == "file":
            # Same uniform resampling as the megakernel
            # (fused_trace._optic_spec): linear interpolation of the
            # sigma/pi-mixed measured curve becomes a tent-weight matvec
            # (MXU) in-kernel; the table itself is static (no gradient),
            # gradients flow through the interpolation ARGUMENT into
            # pose and d-spacing.
            tab = optic.rocking_table
            mix = _f(p.get("rocking_mix", 0.5))
            dtheta = np.asarray(tab["dtheta"], dtype=np.float64)
            curve = (mix * np.asarray(tab["reflect_s"], np.float64)
                     + (1.0 - mix) * np.asarray(tab["reflect_p"],
                                                np.float64))
            K = int(min(2048, _round_up(max(4 * len(dtheta), 128), 128)))
            lo, hi = float(dtheta.min()), float(dtheta.max())
            grid = np.linspace(lo, hi, K)
            spec["rocking"].update(
                table=np.interp(grid, dtheta, curve,
                                left=0.0, right=0.0).astype(np.float32),
                lo=lo, inv_step=(K - 1) / (hi - lo), K=K,
            )
    aps = p.get("aperture")
    if aps:
        from xicsrt_tpu.ops.fused_trace import _optic_spec

        # Reuse the megakernel's aperture spec extraction (static masks).
        full = _optic_spec(optic, 0.0, True, "weight")
        spec["apertures"] = full["apertures"]
    if optic.enable_image:
        nx, ny = (int(v) for v in optic.image_shape)
        spec["image"] = {
            "nx": nx, "ny": ny,
            "nx_pad": _round_up(nx, 8), "ny_pad": _round_up(ny, 128),
            "inv_ps": 1.0 / float(optic.pixel_size),
        }
    return spec


def pack_params(pipeline):
    """Flatten the differentiated leaves of ``pipeline.params`` into the
    SMEM vector (and return the packer for updated pytrees)."""
    from xicsrt_tpu.sources.plasma import PlasmaGeneric

    optics = pipeline.optics
    src_name = (pipeline.source.name
                if isinstance(pipeline.source, PlasmaGeneric) else None)

    def pack(params):
        vals = []
        for o in optics:
            po = params["optics"][o.name]
            frame = po["frame"]
            vals.extend(jnp.ravel(jnp.asarray(frame.origin, jnp.float32)))
            vals.extend(jnp.ravel(jnp.asarray(frame.basis, jnp.float32)))
            vals.append(jnp.asarray(
                po.get("radius", po.get("radius_major", 0.0)), jnp.float32))
            vals.append(jnp.asarray(po.get("crystal_spacing", 0.0),
                                    jnp.float32))
            vals.append(jnp.asarray(po.get("rocking_fwhm", 0.0),
                                    jnp.float32))
            vals.append(jnp.asarray(po.get("reflectivity", 1.0),
                                    jnp.float32))
            vals.append(jnp.asarray(po.get("radius_minor", 0.0),
                                    jnp.float32))
            vals.extend([jnp.float32(0.0)] * (SLOTS_PER_OPTIC - 17))
        if src_name is not None:
            ps = params["sources"][src_name]
            vals.append(jnp.asarray(ps["emissivity"], jnp.float32))
            vals.append(jnp.asarray(ps["temperature"], jnp.float32))
            vals.extend([jnp.float32(0.0)] * (SRC_SLOTS - 2))
        n = _round_up(len(vals), 8)
        vec = jnp.zeros((n,), jnp.float32).at[:len(vals)].set(
            jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])
        )
        return vec

    return pack


def unpack_grads(pipeline, gvec):
    """Map the flat gradient vector back to a params-shaped pytree
    (only differentiated leaves; numpy arrays)."""
    gvec = np.asarray(gvec)
    out = {}
    for i, o in enumerate(pipeline.optics):
        b = i * SLOTS_PER_OPTIC
        out[o.name] = {
            "origin": gvec[b:b + 3].copy(),
            "basis": gvec[b + 3:b + 12].reshape(3, 3).copy(),
            # slot 12 holds radius_major for toroidal optics.
            "radius": float(gvec[b + 12]),
            "crystal_spacing": float(gvec[b + 13]),
            "rocking_fwhm": float(gvec[b + 14]),
            "reflectivity": float(gvec[b + 15]),
            "radius_minor": float(gvec[b + 16]),
        }
    from xicsrt_tpu.sources.plasma import PlasmaGeneric

    if isinstance(pipeline.source, PlasmaGeneric):
        b = len(pipeline.optics) * SLOTS_PER_OPTIC
        out[pipeline.source.name] = {
            "emissivity": float(gvec[b + 0]),
            "temperature": float(gvec[b + 1]),
        }
    return out


# ---------------------------------------------------------------------------
# Pure-jnp forward / backward over (…)-shaped ray values. These run both
# INSIDE the Pallas kernels and OUTSIDE (CPU replica for exact grad tests).
# ---------------------------------------------------------------------------

def _pvec(P, i, k0):
    return (P[i * SLOTS_PER_OPTIC + k0], P[i * SLOTS_PER_OPTIC + k0 + 1],
            P[i * SLOTS_PER_OPTIC + k0 + 2])


def _sample_source(src, draw, sub, f32=jnp.float32):
    """Sample ray origins/directions from ``draw()`` calls — the exact
    formulas and draw order of the megakernel's sampler for this subset
    (``fused_trace.build_fused_run`` source blocks)."""
    ox, oy, oz = src["origin"]
    B = src["basis"]
    px = jnp.full((8, sub), ox, f32)
    py = jnp.full((8, sub), oy, f32)
    pz = jnp.full((8, sub), oz, f32)
    if src["spatial"] in ("uniform", "gaussian"):
        for s, brow in zip(src["sizes"], B):
            if s != 0.0:
                if src["spatial"] == "uniform":
                    o_l = (draw() - 0.5) * s
                else:
                    # sizes already fwhm->sigma converted (_source_spec).
                    u = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
                    o_l = (math.sqrt(2.0)
                           * jax.lax.erf_inv(2.0 * u - 1.0)) * s
                px += o_l * brow[0]
                py += o_l * brow[1]
                pz += o_l * brow[2]
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
        _, g0, g1, sb1, tyl, tyh = dist
        u, v = draw(), draw()
        sx = jnp.sin((g0 + u * (g1 - g0)) * 0.5) / sb1
        tx = sx * jax.lax.rsqrt(jnp.maximum(1.0 - sx * sx, 1e-12))
        k2 = 1.0 + tx * tx
        h0 = tyl * jax.lax.rsqrt(k2 + tyl * tyl)
        h1 = tyh * jax.lax.rsqrt(k2 + tyh * tyh)
        h = h0 + v * (h1 - h0)
        ty = jnp.sqrt(k2) * h * jax.lax.rsqrt(
            jnp.maximum(1.0 - h * h, 1e-12))
        w = jax.lax.rsqrt(1.0 + tx * tx + ty * ty)
        lx, ly, lz = tx * w, ty * w, w
    elif dist[0] == "isotropic_xy_asym":
        # Asymmetric y-bounds: bracket-clamped Newton on the
        # arcsin-difference marginal CDF — the megakernel's sampler
        # verbatim (fused_trace isotropic_xy_asym block; Mosaic-safe
        # polynomial arcsin). Sampling is parameter-independent, so
        # this is forward-only.
        from xicsrt_tpu.ops.polynomials import acos_kernel

        _, sx0, sx1, sb0, sb1, g0, g1, tyl, tyh = dist

        def asin_k(x):
            return math.pi / 2.0 - acos_kernel(jnp.clip(x, -1.0, 1.0))

        u, v = draw(), draw()
        targ = g0 + u * (g1 - g0)
        sx = sx0 + u * (sx1 - sx0)
        for _ in range(12):
            gm = asin_k(sx * sb1) - asin_k(sx * sb0)
            dg = sb1 * jax.lax.rsqrt(jnp.maximum(
                1.0 - (sx * sb1) ** 2, 1e-12)) - sb0 * jax.lax.rsqrt(
                jnp.maximum(1.0 - (sx * sb0) ** 2, 1e-12))
            sx = jnp.clip(
                sx - (gm - targ) / jnp.maximum(dg, 1e-12), sx0, sx1)
        tx = sx * jax.lax.rsqrt(jnp.maximum(1.0 - sx * sx, 1e-12))
        k2 = 1.0 + tx * tx
        h0 = tyl * jax.lax.rsqrt(k2 + tyl * tyl)
        h1 = tyh * jax.lax.rsqrt(k2 + tyh * tyh)
        h = h0 + v * (h1 - h0)
        ty = jnp.sqrt(k2) * h * jax.lax.rsqrt(
            jnp.maximum(1.0 - h * h, 1e-12))
        w = jax.lax.rsqrt(1.0 + tx * tx + ty * ty)
        lx, ly, lz = tx * w, ty * w, w
    elif dist[0] == "flat":
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
    else:  # flat_gaussian (the megakernel's 'gaussian' angular dist)
        sig = dist[1]

        def _normal():
            u = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
            return math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0)

        x = sig * _normal()
        y = sig * _normal()
        w = jax.lax.rsqrt(1.0 + x * x + y * y)
        lx, ly, lz = x * w, y * w, w
    R = src["rot"]
    if R is not None:
        dx = lx * R[0][0] + ly * R[1][0] + lz * R[2][0]
        dy = lx * R[0][1] + ly * R[1][1] + lz * R[2][1]
        dz = lx * R[0][2] + ly * R[1][2] + lz * R[2][2]
    else:
        # Focused source: per-ray emission axis n = (target - p)/|.|,
        # per-ray basis o1 = cross(n, bx + bz), o2 = cross(n, o1)
        # (megakernel focused block / vec.orthogonal_basis). Source
        # sampling carries no parameter dependence, so this is
        # forward-only (reparameterized MC).
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
    wave = src["wave"]
    if wave[0] == "uniform":
        lam = wave[1] + draw() * (wave[2] - wave[1])
    elif wave[0] == "voigt":
        # Exact Voigt = Gauss(sigma) + Cauchy(gamma) (megakernel /
        # plasma.py decomposition); sigma/gamma are static source
        # parameters here (the plasma path differentiates T).
        _, w0_, sigma_, gamma_ = wave
        lam = jnp.full((8, sub), w0_, f32)
        if sigma_ > 0.0:
            u = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
            lam = lam + sigma_ * (
                math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0))
        if gamma_ > 0.0:
            uc = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
            lam = lam + gamma_ * jnp.tan(math.pi * (uc - 0.5))
    else:
        lam = src["wavelength"]  # scalar; broadcasts
    if src.get("velocity") is not None:
        vx_, vy_, vz_ = src["velocity"]
        lam = lam * (1.0 - (vx_ * dx + vy_ * dy + vz_ * dz)
                     * (1.0 / 299792458.0))
    return px, py, pz, dx, dy, dz, lam


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _file_interp(rk, T, delta, need_slope):
    """Linear interpolation of a uniformly-resampled rocking curve as a
    tent-weight matvec (MXU; the megakernel's ``rock_prob`` file branch —
    no Mosaic gather exists), plus the curve's piecewise-constant SLOPE
    via the tent-derivative matvec when the backward needs it.

    Returns ``(val, slope_or_None, in_range)`` over (8, sub) deltas.
    The table is static: gradients flow through the interpolation
    argument only (matching ``_InteractCrystal.py:151-181`` semantics
    where the measured curve is data, not a parameter).
    """
    K = rk["K"]
    dt = delta.dtype
    fidx = (delta - rk["lo"]) * rk["inv_step"]
    inr = (fidx >= 0.0) & (fidx <= K - 1)
    fidx = jnp.clip(fidx, 0.0, K - 1.0)
    sub = delta.shape[-1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (K, sub), 0).astype(dt)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, delta.shape, 0)
    Tm = jnp.asarray(T, dt).reshape(1, K)
    val = jnp.zeros(delta.shape, dt)
    slope = jnp.zeros(delta.shape, dt) if need_slope else None
    dn = (((1,), (0,)), ((), ()))
    for sl in range(8):
        dxt = fidx[sl][None, :] - kio
        tent = jnp.maximum(0.0, 1.0 - jnp.abs(dxt))
        v = jax.lax.dot_general(Tm, tent, dn, preferred_element_type=dt)
        val = val + jnp.where(rows_i == sl, v[0][None, :], 0.0)
        if need_slope:
            # d tent / d fidx = -sign(dxt) on the open support, 0 at the
            # apex (sign(0) = 0) — identical to autodiff of the tent.
            dtent = jnp.where(jnp.abs(dxt) < 1.0, -jnp.sign(dxt), 0.0)
            sv = jax.lax.dot_general(Tm, dtent, dn,
                                     preferred_element_type=dt)
            slope = slope + jnp.where(rows_i == sl, sv[0][None, :], 0.0)
    if need_slope:
        slope = slope * rk["inv_step"]
    return val, slope, inr


def _rock_fwd(o, P, i, delta, tables, need_saved):
    """Rocking-curve reflection probability (gaussian / step / file),
    shared by the crystal and mosaic branches of the forward. Returns
    ``(prob, rsave)`` with the per-type primals the backward needs."""
    fwhm = P[i * SLOTS_PER_OPTIC + 14]
    refl = P[i * SLOTS_PER_OPTIC + 15]
    rtype = o["rocking"]["type"]
    rsave = {}
    if rtype == "gaussian":
        sigma = fwhm * (1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0))))
        sigma = jnp.maximum(sigma, _EPS)
        z = delta / sigma
        prob = refl * jnp.exp(-0.5 * z * z)
        rsave.update(sigma=sigma, z=z)
    elif rtype == "step":
        inside = jnp.abs(delta) <= fwhm / 2.0
        prob = jnp.where(inside, refl, 0.0)
        rsave.update(step_in=inside)
    else:  # file
        rk = o["rocking"]
        val, slope, inr = _file_interp(
            rk, tables[rk["slot"]], delta, need_slope=need_saved)
        prob = jnp.where(inr, refl * val, 0.0)
        rsave.update(file_val=val, file_slope=slope, file_in=inr)
    rsave["prob"] = prob
    rsave["refl"] = refl
    return prob, rsave


def _rock_bwd(o, base, rsave, prob_b, add_slot, mf, zeros):
    """Adjoint of :func:`_rock_fwd`: accumulates the rocking_fwhm and
    reflectivity slots, returns the deviation cotangent ``delta_b``."""
    prob = rsave["prob"]
    rtype = o["rocking"]["type"]
    if rtype == "gaussian":
        sigma = rsave["sigma"]
        z = rsave["z"]
        delta_b = prob_b * prob * (-z / sigma)
        sigma_b = prob_b * prob * (z * z / sigma)
        refl_b = prob_b * (prob / jnp.maximum(rsave["refl"], _EPS))
        add_slot(
            base + 14,
            sigma_b * mf
            * (1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0)))),
        )
    elif rtype == "step":
        inf_ = rsave["step_in"].astype(zeros.dtype)
        refl_b = prob_b * inf_
        delta_b = zeros
    else:  # file
        inf_ = rsave["file_in"].astype(zeros.dtype)
        refl_b = prob_b * rsave["file_val"] * inf_
        delta_b = prob_b * rsave["refl"] * rsave["file_slope"] * inf_
    add_slot(base + 15, refl_b * mf)
    return delta_b


def _trace_fwd(optics, src, P, px, py, pz, dx, dy, dz, alive,
               lam=None, need_saved=True, tables=None, w0=None,
               draw=None):
    """Weight-mode forward chain. Returns (saved, images_data, final).

    ``P``: flat params vector (jnp, length 24*n_optics, padded).
    ``saved``: per-optic dict of primals the backward needs.
    ``images_data``: list of (optic_index, w_img, fx, fy) for imaged
    optics (pixel coordinates + masked weights).
    ``tables``: list of (1, K) rocking-curve tables indexed by each file
    crystal's ``rocking["slot"]`` (in-kernel these are loaded VMEM refs).
    ``w0``: optional per-ray initial weight (plasma photon rate).
    ``draw``: uniform-draw callable for in-chain sampling (mosaic
    crystallite layers; continues the source sampler's draw sequence).
    """
    f32 = px.dtype
    w = jnp.ones_like(px) if w0 is None else w0 + jnp.zeros_like(px)
    if lam is None:
        lam = src["wavelength"]
    saved = []
    images_data = []
    for i, o in enumerate(optics):
        oxp, oyp, ozp = _pvec(P, i, 0)
        bxx, bxy, bxz = _pvec(P, i, 3)
        byx, byy, byz = _pvec(P, i, 6)
        bzx, bzy, bzz = _pvec(P, i, 9)
        s = {}
        if o["shape"] == "plane":
            D = _dot3(dx, dy, dz, bzx, bzy, bzz)
            Dsafe = jnp.where(jnp.abs(D) > 1e-30, D, 1e-30)
            N = ((oxp - px) * bzx + (oyp - py) * bzy + (ozp - pz) * bzz)
            t = N / Dsafe
            mask = alive & (t >= 0.0)
            nxv = jnp.full_like(px, 0.0) + bzx
            nyv = jnp.full_like(px, 0.0) + bzy
            nzv = jnp.full_like(px, 0.0) + bzz
            s.update(D=Dsafe)
        elif o["shape"] == "sphere":
            r = P[i * SLOTS_PER_OPTIC + 12]
            sign = -1.0 if o["convex"] else 1.0
            Cx = oxp + sign * r * bzx
            Cy = oyp + sign * r * bzy
            Cz = ozp + sign * r * bzz
            Lx, Ly, Lz = Cx - px, Cy - py, Cz - pz
            t_ca = _dot3(Lx, Ly, Lz, dx, dy, dz)
            d2 = Lx * Lx + Ly * Ly + Lz * Lz - t_ca * t_ca
            r2 = r * r
            mask = alive & (d2 <= r2)
            t_hc = jnp.sqrt(jnp.maximum(r2 - d2, _EPS))
            t = t_ca + (-t_hc if o["convex"] else t_hc)
            s.update(Lx=Lx, Ly=Ly, Lz=Lz, t_ca=t_ca, t_hc=t_hc,
                     Cx=Cx, Cy=Cy, Cz=Cz, r=r)
        elif o["shape"] == "torus":
            # Torus axis along the local yaxis, tube center circle of
            # radius r_maj = radius_major + major_adjust*radius_minor
            # around center o + center_sign*radius_major*bz (shapes.py
            # ShapeTorus / megakernel fused_trace torus branch;
            # _ShapeTorus.py:54-91).
            Rmj = P[i * SLOTS_PER_OPTIC + 12]
            rmn = P[i * SLOTS_PER_OPTIC + 16]
            r_maj = Rmj + o["major_adjust"] * rmn
            cs = o["center_sign"]
            Cx = oxp + cs * Rmj * bzx
            Cy = oyp + cs * Rmj * bzy
            Cz = ozp + cs * Rmj * bzz
            rx_, ry_, rz_ = px - Cx, py - Cy, pz - Cz
            Olx = rx_ * bxx + ry_ * bxy + rz_ * bxz
            Oly = rx_ * byx + ry_ * byy + rz_ * byz
            Olz = rx_ * bzx + ry_ * bzy + rz_ * bzz
            Dlx = _dot3(dx, dy, dz, bxx, bxy, bxz)
            Dly = _dot3(dx, dy, dz, byx, byy, byz)
            Dlz = _dot3(dx, dy, dz, bzx, bzy, bzz)
            # Root find on STOP-GRADIENT copies (the megakernel's
            # tangent-plane seed + 4 local-quadratic iterations on
            # G(t) = (rho - r_maj)^2 + Y^2 - r_min^2); differentiability
            # comes from ONE explicit Newton correction at the converged
            # (constant) t0 below — the implicit-function derivative —
            # so autodiff of this forward and the hand adjoint agree
            # exactly instead of differentiating through the iteration.
            sgf = jax.lax.stop_gradient
            Olx0, Oly0, Olz0 = sgf(Olx), sgf(Oly), sgf(Olz)
            Dlx0, Dly0, Dlz0 = sgf(Dlx), sgf(Dly), sgf(Dlz)
            rmaj0, rmn0 = sgf(r_maj), sgf(rmn)
            z0_ = ((px - oxp) * bzx + (py - oyp) * bzy
                   + (pz - ozp) * bzz)
            zd_safe = jnp.where(jnp.abs(Dlz0) > 1e-9, Dlz0, 1e-9)
            t0 = sgf(-z0_ / zd_safe)
            step = jnp.zeros_like(t0)
            for _it in range(4):
                X0 = Olx0 + t0 * Dlx0
                Y0 = Oly0 + t0 * Dly0
                Z0 = Olz0 + t0 * Dlz0
                rho0 = jnp.sqrt(jnp.maximum(X0 * X0 + Z0 * Z0, 1e-30))
                rr0 = rho0 - rmaj0
                G0 = rr0 * rr0 + Y0 * Y0 - rmn0 * rmn0
                rhop0 = (X0 * Dlx0 + Z0 * Dlz0) / rho0
                Gp0 = 2.0 * rr0 * rhop0 + 2.0 * Y0 * Dly0
                rhopp0 = ((Dlx0 * Dlx0 + Dlz0 * Dlz0)
                          - rhop0 * rhop0) / rho0
                Gpp0 = (2.0 * (rhop0 * rhop0 + rr0 * rhopp0)
                        + 2.0 * Dly0 * Dly0)
                disc0 = Gp0 * Gp0 - 2.0 * Gpp0 * G0
                sg0 = jnp.where(Gp0 >= 0.0, 1.0, -1.0)
                den0 = Gp0 + sg0 * jnp.sqrt(jnp.maximum(disc0, 0.0))
                den0 = jnp.where(jnp.abs(den0) > 1e-12, den0,
                                 sg0 * 1e-12)
                Gps0 = jnp.where(jnp.abs(Gp0) > 1e-12, Gp0, sg0 * 1e-12)
                step = jnp.where(disc0 >= 0.0, 2.0 * G0 / den0,
                                 G0 / Gps0)
                t0 = t0 - step
            # NaN/inf iterates fail the comparisons (no isfinite needed —
            # and Mosaic has no lowering for it).
            m_int = ((jnp.abs(step) < 1e-5 * jnp.maximum(1.0, rmaj0))
                     & (t0 > 1e-6) & (t0 < 1e6))
            mask = alive & m_int
            # Sanitize the converged root so missed/diverged lanes carry
            # finite primals (NaN saved values would poison the masked
            # adjoint sums: 0 * NaN = NaN).
            t0s = jnp.where(m_int, t0, 0.0)
            Xt = Olx + t0s * Dlx
            Yt = Oly + t0s * Dly
            Zt = Olz + t0s * Dlz
            rho = jnp.sqrt(jnp.maximum(Xt * Xt + Zt * Zt, 1e-30))
            rr = rho - r_maj
            Gv = rr * rr + Yt * Yt - rmn * rmn
            rhop = (Xt * Dlx + Zt * Dlz) / rho
            Gp = 2.0 * rr * rhop + 2.0 * Yt * Dly
            sgp = jnp.where(Gp >= 0.0, 1.0, -1.0)
            Gp = jnp.where(jnp.abs(Gp) > 1e-9, Gp, sgp * 1e-9)
            t = jnp.where(m_int, t0s - Gv / Gp, 0.0)
            s.update(t0s=t0s, X=Xt, Y=Yt, Z=Zt, rho=rho, rr=rr, G=Gv,
                     rhop=rhop, Gp_t=Gp, m_int=m_int,
                     Dlx=Dlx, Dly=Dly, Dlz=Dlz,
                     rx=rx_, ry=ry_, rz=rz_,
                     Cx=Cx, Cy=Cy, Cz=Cz, r_maj=r_maj, Rmj=Rmj, rmn=rmn)
        else:  # cylinder (axis along the local xaxis; shapes.py)
            r = P[i * SLOTS_PER_OPTIC + 12]
            sign = -1.0 if o["convex"] else 1.0
            Cx = oxp + sign * r * bzx
            Cy = oyp + sign * r * bzy
            Cz = ozp + sign * r * bzz
            dpx_, dpy_, dpz_ = px - Cx, py - Cy, pz - Cz
            d_ax = _dot3(dx, dy, dz, bxx, bxy, bxz)
            p_ax = _dot3(dpx_, dpy_, dpz_, bxx, bxy, bxz)
            A1x = dx - d_ax * bxx
            A1y = dy - d_ax * bxy
            A1z = dz - d_ax * bxz
            B1x = dpx_ - p_ax * bxx
            B1y = dpy_ - p_ax * bxy
            B1z = dpz_ - p_ax * bxz
            qa = A1x * A1x + A1y * A1y + A1z * A1z
            qb = 2.0 * (A1x * B1x + A1y * B1y + A1z * B1z)
            qc = B1x * B1x + B1y * B1y + B1z * B1z - r * r
            disc = qb * qb - 4.0 * qa * qc
            mask = alive & (disc >= 0.0)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            sgq = jnp.where(qb >= 0.0, 1.0, -1.0)
            qq = -0.5 * (qb + sgq * sq)
            t0_ = qq / jnp.where(jnp.abs(qa) > 1e-30, qa, 1e-30)
            t1_ = qc / jnp.where(jnp.abs(qq) > 1e-30, qq, 1e-30)
            t1_ = jnp.where(jnp.abs(qq) > 1e-30, t1_, t0_)
            t = (jnp.minimum(t0_, t1_) if o["convex"]
                 else jnp.maximum(t0_, t1_))
            s.update(A1x=A1x, A1y=A1y, A1z=A1z,
                     B1x=B1x, B1y=B1y, B1z=B1z,
                     qa=qa, qb=qb, d_ax=d_ax, p_ax=p_ax,
                     dpx=dpx_, dpy=dpy_, dpz=dpz_,
                     Cx=Cx, Cy=Cy, Cz=Cz, r=r)
        qx = px + t * dx
        qy = py + t * dy
        qz = pz + t * dz
        if o["shape"] == "sphere":
            # Same sign-free convention as the megakernel: n points from
            # the hit toward the center for both convexities (reflection
            # and |dot| Bragg tests are orientation-invariant). |C-q|=r
            # identically at the hit, so /r normalization is exact.
            sgn = 1.0
            inv_r = 1.0 / jnp.maximum(r, _EPS)
            nxv = (s["Cx"] - qx) * inv_r * sgn
            nyv = (s["Cy"] - qy) * inv_r * sgn
            nzv = (s["Cz"] - qz) * inv_r * sgn
            s.update(inv_r=inv_r, sgn=sgn)
        elif o["shape"] == "cylinder":
            # Normal toward the axis (megakernel convention: explicit
            # normalize of the axis-perpendicular component).
            tcx, tcy, tcz = s["Cx"] - qx, s["Cy"] - qy, s["Cz"] - qz
            along = _dot3(tcx, tcy, tcz, bxx, bxy, bxz)
            ux = tcx - along * bxx
            uy = tcy - along * bxy
            uz = tcz - along * bxz
            inv_u = jax.lax.rsqrt(jnp.maximum(
                ux * ux + uy * uy + uz * uz, 1e-30))
            nxv = ux * inv_u
            nyv = uy * inv_u
            nzv = uz * inv_u
            s.update(tcx=tcx, tcy=tcy, tcz=tcz, along=along,
                     ux=ux, uy=uy, uz=uz, inv_u=inv_u)
        elif o["shape"] == "torus":
            # Project the hit onto the torus axis circle (axis = by) and
            # point from the tube center to the hit — the shapes.py /
            # megakernel convention.
            ptx, pty, ptz = qx - s["Cx"], qy - s["Cy"], qz - s["Cz"]
            dy_ax = _dot3(ptx, pty, ptz, byx, byy, byz)
            plx = ptx - dy_ax * byx
            ply = pty - dy_ax * byy
            plz = ptz - dy_ax * byz
            inv_pl = jax.lax.rsqrt(jnp.maximum(
                plx * plx + ply * ply + plz * plz, 1e-30))
            tux = plx * inv_pl
            tuy = ply * inv_pl
            tuz = plz * inv_pl
            tmx = ptx - s["r_maj"] * tux
            tmy = pty - s["r_maj"] * tuy
            tmz = ptz - s["r_maj"] * tuz
            inv_m = jax.lax.rsqrt(jnp.maximum(
                tmx * tmx + tmy * tmy + tmz * tmz, 1e-30))
            nxv = tmx * inv_m
            nyv = tmy * inv_m
            nzv = tmz * inv_m
            s.update(ptx=ptx, pty=pty, ptz=ptz, dy_ax=dy_ax,
                     inv_pl=inv_pl, tux=tux, tuy=tuy, tuz=tuz,
                     inv_m=inv_m)

        rxq, ryq, rzq = qx - oxp, qy - oyp, qz - ozp
        lxv = rxq * bxx + ryq * bxy + rzq * bxz
        lyv = rxq * byx + ryq * byy + rzq * byz
        if o["check_size"]:
            if o["xsize"]:
                mask = mask & (jnp.abs(lxv) < o["xsize"] / 2.0)
            if o["ysize"]:
                mask = mask & (jnp.abs(lyv) < o["ysize"] / 2.0)
            if o["zsize"]:
                # Depth bound on curved optics (base.py check_size /
                # megakernel fused_trace lzv test). A hard edge: zero
                # gradient, like the x/y bounds and apertures.
                lzv = rxq * bzx + ryq * bzy + rzq * bzz
                mask = mask & (jnp.abs(lzv) < o["zsize"] / 2.0)
        # Aperture block: verbatim semantics of the megakernel
        # (fused_trace.py _trace_chain aperture loop / ops/aperture.py).
        m_in = mask
        m_out = m_in
        for ap in o["apertures"]:
            ax_ = lxv - ap["ox"]
            ay_ = lyv - ap["oy"]
            shape_ = ap["shape"]
            if shape_ == "none":
                m_test = m_in
            elif shape_ == "circle":
                r_ = ap["size"][0]
                m_test = (ax_ * ax_ + ay_ * ay_ < r_ * r_) & m_in
            elif shape_ == "square":
                s_ = ap["size"][0] / 2.0
                m_test = (jnp.abs(ax_) < s_) & (jnp.abs(ay_) < s_) & m_in
            elif shape_ == "rectangle":
                m_test = ((jnp.abs(ax_) < ap["size"][0] / 2.0)
                          & (jnp.abs(ay_) < ap["size"][1] / 2.0) & m_in)
            else:  # ellipse
                sx_, sy_ = ap["size"][0], ap["size"][1]
                m_test = ((ax_ / sx_) ** 2 + (ay_ / sy_) ** 2 < 1.0) & m_in
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

        dpre = (dx, dy, dz)
        if o["interact"] == "crystal":
            d_s = P[i * SLOTS_PER_OPTIC + 13]
            refl = P[i * SLOTS_PER_OPTIC + 15]
            sin_b = jnp.clip(lam / (2.0 * jnp.maximum(d_s, _EPS)),
                             0.0, 1.0)
            cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, _EPS))
            dot = _dot3(dx, dy, dz, nxv, nyv, nzv)
            adot = jnp.abs(dot)
            cosi = jnp.sqrt(jnp.maximum(1.0 - adot * adot, _EPS))
            sd = adot * cos_b - cosi * sin_b
            delta = sd + sd * sd * sd * (1.0 / 6.0)
            # Hard edges (step band, file support) carry zero gradient —
            # the module's hard-edge convention (_InteractCrystal.py).
            prob, rsave = _rock_fwd(o, P, i, delta, tables, need_saved)
            s.update(rsave)
            w_pre = w
            w = jnp.where(mask, w * prob, w)
            kk = 2.0 * dot
            dx = jnp.where(mask, dx - kk * nxv, dx)
            dy = jnp.where(mask, dy - kk * nyv, dy)
            dz = jnp.where(mask, dz - kk * nzv, dz)
            s.update(dot=dot, adot=adot, cosi=cosi, sd=sd,
                     prob=prob, w_pre=w_pre, sin_b=sin_b,
                     cos_b=cos_b, d_s=d_s, refl=refl, lam=lam)
        elif o["interact"] == "mosaic":
            mz = o["mosaic"]
            d_s = P[i * SLOTS_PER_OPTIC + 13]
            sin_b = jnp.clip(lam / (2.0 * jnp.maximum(d_s, _EPS)),
                             0.0, 1.0)
            cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, _EPS))
            if mz["cutoff_angle"] is not None:
                # Angular prefilter: a hard mask, zero gradient
                # (megakernel fused_trace mosaic branch).
                dot0 = _dot3(dx, dy, dz, nxv, nyv, nzv)
                adot0 = jnp.abs(dot0)
                cosi0 = jnp.sqrt(jnp.maximum(1.0 - adot0 * adot0, _EPS))
                sd0 = adot0 * cos_b - cosi0 * sin_b
                d0d = sd0 + sd0 * sd0 * sd0 * (1.0 / 6.0)
                mask = mask & (jnp.abs(d0d) < mz["cutoff_angle"])
            # Crystallite basis around the macroscopic normal
            # (megakernel / interactions.py mosaic_normals: hint axes
            # e1+e3): o1 = normalize((ny, nz-nx, -ny)),
            # o2 = normalize(cross(n, o1)).
            o1rx, o1ry, o1rz = nyv, nzv - nxv, -nyv
            inv1 = jax.lax.rsqrt(jnp.maximum(
                o1rx * o1rx + o1ry * o1ry + o1rz * o1rz, 1e-30))
            o1x = o1rx * inv1
            o1y = o1ry * inv1
            o1z = o1rz * inv1
            o2rx = nyv * o1z - nzv * o1y
            o2ry = nzv * o1x - nxv * o1z
            o2rz = nxv * o1y - nyv * o1x
            inv2 = jax.lax.rsqrt(jnp.maximum(
                o2rx * o2rx + o2ry * o2ry + o2rz * o2rz, 1e-30))
            o2x = o2rx * inv2
            o2y = o2ry * inv2
            o2z = o2rz * inv2
            d0x, d0y, d0z = dx, dy, dz
            surv = jnp.ones_like(px)
            cum = jnp.zeros_like(px)
            cdx, cdy, cdz = dx, dy, dz
            layers = []
            for _l in range(mz["depth"]):
                u1 = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
                gx = mz["sigma_n"] * (
                    math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u1 - 1.0))
                u2 = jnp.clip(draw(), 1e-7, 1.0 - 1e-7)
                gy = mz["sigma_n"] * (
                    math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u2 - 1.0))
                wn = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
                nmx = gx * wn * o2x + gy * wn * o1x + wn * nxv
                nmy = gx * wn * o2y + gy * wn * o1y + wn * nyv
                nmz = gx * wn * o2z + gy * wn * o1z + wn * nzv
                dotm = _dot3(d0x, d0y, d0z, nmx, nmy, nmz)
                adot = jnp.abs(dotm)
                cosi = jnp.sqrt(jnp.maximum(1.0 - adot * adot, _EPS))
                sd = adot * cos_b - cosi * sin_b
                delta = sd + sd * sd * sd * (1.0 / 6.0)
                prob, rsave = _rock_fwd(o, P, i, delta, tables,
                                        need_saved)
                q = prob * surv
                cum_new = cum + q
                u = draw()
                # Online categorical (reservoir) pick of the reflecting
                # layer — the selection indicator is a hard edge (zero
                # gradient), exactly as jax.grad of the XLA weight-mode
                # estimator treats it (interactions.py:268-305).
                pick = mask & (u * cum_new < q)
                kk = 2.0 * dotm
                cdx = jnp.where(pick, d0x - kk * nmx, cdx)
                cdy = jnp.where(pick, d0y - kk * nmy, cdy)
                cdz = jnp.where(pick, d0z - kk * nmz, cdz)
                if need_saved:
                    layers.append(dict(
                        rsave, nmx=nmx, nmy=nmy, nmz=nmz, dotm=dotm,
                        adot=adot, cosi=cosi, sd=sd, surv_prev=surv,
                        pick=pick, gxw=gx * wn, gyw=gy * wn, wn=wn,
                    ))
                surv = surv * (1.0 - prob)
                cum = cum_new
            w_pre = w
            w = jnp.where(mask, w * cum, w)
            dx, dy, dz = cdx, cdy, cdz
            s.update(layers=layers, cum=cum, w_pre=w_pre,
                     sin_b=sin_b, cos_b=cos_b, d_s=d_s, lam=lam,
                     o1x=o1x, o1y=o1y, o1z=o1z,
                     o2x=o2x, o2y=o2y, o2z=o2z,
                     inv1=inv1, inv2=inv2,
                     o1rx=o1rx, o1ry=o1ry, o1rz=o1rz,
                     o2rx=o2rx, o2ry=o2ry, o2rz=o2rz)
        elif o["interact"] == "mirror":
            dot = _dot3(dx, dy, dz, nxv, nyv, nzv)
            kk = 2.0 * dot
            dx = jnp.where(mask, dx - kk * nxv, dx)
            dy = jnp.where(mask, dy - kk * nyv, dy)
            dz = jnp.where(mask, dz - kk * nzv, dz)
            s.update(dot=dot)

        if o["image"] is not None:
            im = o["image"]
            fx = lxv * im["inv_ps"] + (im["nx"] - 1) / 2.0
            fy = lyv * im["inv_ps"] + (im["ny"] - 1) / 2.0
            w_img = jnp.where(mask, w, 0.0).astype(f32)
            images_data.append((i, w_img, fx, fy))

        if need_saved:
            s.update(t=t, qx=qx, qy=qy, qz=qz,
                     nxv=nxv, nyv=nyv, nzv=nzv,
                     lxv=lxv, lyv=lyv, mask=mask,
                     dpre=dpre, w_at=w)
        saved.append(s)
        px, py, pz = qx, qy, qz
        alive = mask
    return saved, images_data, (px, py, pz, dx, dy, dz, w, alive)


def _trace_bwd(optics, src, P, saved, seeds):
    """Hand-derived adjoint sweep. ``seeds``: per-optic dict
    {i: (gw, glx, gly)} of cotangents on (masked weight, local-x,
    local-y) at imaged optics. Returns ``(gslots, wb, lamb)``: the flat
    gradient vector contributions (dict slot->(…) arrays to be summed
    by the caller) plus the terminal adjoints of the initial ray weight
    and the wavelength (for source-parameter slots,
    ``_source_slot_grads``)."""
    n = len(optics)
    zeros = jnp.zeros_like(saved[0]["t"])
    pbx = pby = pbz = zeros  # adjoint of optic-chain position (q of i-1)
    dbx = dby = dbz = zeros  # adjoint of direction leaving optic i
    wb = zeros               # adjoint of weight after optic i
    lamb = zeros             # adjoint of the (per-ray) wavelength
    gslots = {}

    def add_slot(j, val):
        gslots[j] = gslots.get(j, zeros) + val

    for i in range(n - 1, -1, -1):
        o = optics[i]
        s = saved[i]
        base = i * SLOTS_PER_OPTIC
        mask = s["mask"]
        mf = mask.astype(zeros.dtype)
        bxx, bxy, bxz = _pvec(P, i, 3)
        byx, byy, byz = _pvec(P, i, 6)
        bzx, bzy, bzz = _pvec(P, i, 9)
        oxp, oyp, ozp = _pvec(P, i, 0)

        qbx = pbx
        qby = pby
        qbz = pbz
        lxb = zeros
        lyb = zeros
        if i in seeds:
            gw, glx, gly = seeds[i]
            # Image used w AFTER interact and masked; weight adjoint
            # flows into the post-interact weight.
            wb = wb + gw * mf
            lxb = lxb + glx * mf
            lyb = lyb + gly * mf

        # ---- interact reverse (uses PRE-reflection direction) -----------
        nbx = nby = nbz = zeros
        if o["interact"] in ("crystal", "mirror"):
            d0x, d0y, d0z = s["dpre"]
            dot = s["dot"]
            # d_post = d_pre - 2*dot*n  (only where mask)
            # d_post = d_pre - 2*dot*n (where mask), dot = d_pre . n.
            # Matrix forms (dot-dependence INCLUDED): with
            # a = n . d̄_post:  d̄_pre = d̄_post - 2 a n;
            # n̄ += -2 (a d_pre + dot d̄_post).
            a = _dot3(dbx, dby, dbz, s["nxv"], s["nyv"], s["nzv"])
            dpre_bx = jnp.where(mask, dbx - 2.0 * a * s["nxv"], dbx)
            dpre_by = jnp.where(mask, dby - 2.0 * a * s["nyv"], dby)
            dpre_bz = jnp.where(mask, dbz - 2.0 * a * s["nzv"], dbz)
            nbx = nbx - mf * 2.0 * (a * d0x + dot * dbx)
            nby = nby - mf * 2.0 * (a * d0y + dot * dby)
            nbz = nbz - mf * 2.0 * (a * d0z + dot * dbz)
            dbx, dby, dbz = dpre_bx, dpre_by, dpre_bz
            # The Bragg-probability chain contributes through dot
            # SEPARATELY (via adot); accumulated below as dot_b.
            dot_b = zeros
            if o["interact"] == "crystal":
                prob = s["prob"]
                # w_post = where(mask, w_pre * prob, w_pre)
                prob_b = jnp.where(mask, wb * s["w_pre"], 0.0)
                wb = jnp.where(mask, wb * prob, wb)
                rtype = o["rocking"]["type"]
                if rtype == "gaussian":
                    sigma = s["sigma"]
                    z = s["z"]
                    delta_b = prob_b * prob * (-z / sigma)
                    sigma_b = prob_b * prob * (z * z / sigma)
                    refl_b = prob_b * (prob / jnp.maximum(
                        s["refl"], _EPS))
                    add_slot(
                        base + 14,
                        sigma_b * mf
                        * (1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0)))),
                    )
                elif rtype == "step":
                    # prob = where(|delta| <= fwhm/2, refl, 0): hard
                    # edges in delta and fwhm carry zero gradient.
                    inf_ = s["step_in"].astype(zeros.dtype)
                    refl_b = prob_b * inf_
                    delta_b = zeros
                else:  # file
                    inf_ = s["file_in"].astype(zeros.dtype)
                    refl_b = prob_b * s["file_val"] * inf_
                    delta_b = (prob_b * s["refl"] * s["file_slope"]
                               * inf_)
                add_slot(base + 15, refl_b * mf)
                sd = s["sd"]
                sd_b = delta_b * (1.0 + 0.5 * sd * sd)
                adot_b = sd_b * (s["cos_b"]
                                 + s["adot"] / s["cosi"] * s["sin_b"])
                sinb_b = sd_b * (-s["adot"] * s["sin_b"] / s["cos_b"]
                                 - s["cosi"])
                lam = s["lam"]
                d_s = s["d_s"]
                ds_b = sinb_b * (-lam / (2.0 * jnp.maximum(
                    d_s * d_s, _EPS)))
                # clip: zero gradient outside (0,1)
                inr = (s["sin_b"] > 0.0) & (s["sin_b"] < 1.0)
                add_slot(base + 13, jnp.where(inr, ds_b, 0.0) * mf)
                # sin_b = lam / (2 d_s): the wavelength adjoint feeds the
                # plasma temperature slot (reparameterized Doppler width).
                lamb = lamb + jnp.where(
                    inr, sinb_b / (2.0 * jnp.maximum(d_s, _EPS)), 0.0
                ) * mf
                dot_b = jnp.sign(dot) * adot_b * mf
            # dot = d_pre . n
            dbx = dbx + dot_b * s["nxv"]
            dby = dby + dot_b * s["nyv"]
            dbz = dbz + dot_b * s["nzv"]
            nbx = nbx + dot_b * d0x
            nby = nby + dot_b * d0y
            nbz = nbz + dot_b * d0z
        elif o["interact"] == "mosaic":
            # Reverse of the depth-aware survival estimator:
            #   cum_l = cum_{l-1} + prob_l * surv_{l-1}
            #   surv_l = surv_{l-1} * (1 - prob_l)
            #   w_post = where(mask, w_pre * cum_D, w_pre)
            #   d_post = reflection at the LAST picked layer (or d_pre).
            # The reservoir pick indicators are hard edges (zero
            # gradient) — identical to jax.grad of the XLA estimator.
            d0x, d0y, d0z = s["dpre"]
            cum_b = jnp.where(mask, wb * s["w_pre"], 0.0)
            wb = jnp.where(mask, wb * s["cum"], wb)
            layers = s["layers"]
            # ---- direction routing: adjoint goes to the last pick ----
            d0bx = d0by = d0bz = zeros
            taken = jnp.zeros_like(mask)
            refl_route = [None] * len(layers)
            for li in range(len(layers) - 1, -1, -1):
                L = layers[li]
                uf = (L["pick"] & ~taken).astype(zeros.dtype)
                a = _dot3(dbx, dby, dbz, L["nmx"], L["nmy"], L["nmz"])
                d0bx = d0bx + uf * (dbx - 2.0 * a * L["nmx"])
                d0by = d0by + uf * (dby - 2.0 * a * L["nmy"])
                d0bz = d0bz + uf * (dbz - 2.0 * a * L["nmz"])
                refl_route[li] = (uf, a)
                taken = taken | L["pick"]
            nf = (~taken).astype(zeros.dtype)
            d0bx = d0bx + nf * dbx
            d0by = d0by + nf * dby
            d0bz = d0bz + nf * dbz
            # ---- per-layer prob + normal chains ----------------------
            s_b = zeros
            sinb_b_tot = zeros
            o1bx = o1by = o1bz = zeros
            o2bx = o2by = o2bz = zeros
            for li in range(len(layers) - 1, -1, -1):
                L = layers[li]
                prob = L["prob"]
                prob_b = (cum_b - s_b) * L["surv_prev"]
                s_b = cum_b * prob + s_b * (1.0 - prob)
                delta_b = _rock_bwd(o, base, L, prob_b, add_slot, mf,
                                    zeros)
                sd = L["sd"]
                sd_b = delta_b * (1.0 + 0.5 * sd * sd)
                adot_b = sd_b * (s["cos_b"]
                                 + L["adot"] / L["cosi"] * s["sin_b"])
                sinb_b_tot = sinb_b_tot + sd_b * (
                    -L["adot"] * s["sin_b"] / s["cos_b"] - L["cosi"])
                dot_b = jnp.sign(L["dotm"]) * adot_b * mf
                uf, a = refl_route[li]
                # nm adjoint: reflection (where routed) + dotm chain.
                nmbx = (-2.0 * uf * (a * d0x + L["dotm"] * dbx)
                        + dot_b * d0x)
                nmby = (-2.0 * uf * (a * d0y + L["dotm"] * dby)
                        + dot_b * d0y)
                nmbz = (-2.0 * uf * (a * d0z + L["dotm"] * dbz)
                        + dot_b * d0z)
                d0bx = d0bx + dot_b * L["nmx"]
                d0by = d0by + dot_b * L["nmy"]
                d0bz = d0bz + dot_b * L["nmz"]
                # nm = gxw o2 + gyw o1 + wn n (gxw/gyw/wn constants).
                o2bx = o2bx + L["gxw"] * nmbx
                o2by = o2by + L["gxw"] * nmby
                o2bz = o2bz + L["gxw"] * nmbz
                o1bx = o1bx + L["gyw"] * nmbx
                o1by = o1by + L["gyw"] * nmby
                o1bz = o1bz + L["gyw"] * nmbz
                nbx = nbx + L["wn"] * nmbx
                nby = nby + L["wn"] * nmby
                nbz = nbz + L["wn"] * nmbz
            # ---- crystallite basis reverse ---------------------------
            # o2 = normalize(o2raw), o2raw = cross(n, o1)
            o2d = (s["o2x"] * o2bx + s["o2y"] * o2by + s["o2z"] * o2bz)
            o2rbx = s["inv2"] * (o2bx - s["o2x"] * o2d)
            o2rby = s["inv2"] * (o2by - s["o2y"] * o2d)
            o2rbz = s["inv2"] * (o2bz - s["o2z"] * o2d)
            # c = a x b: a_b += b x c_b ; b_b += c_b x a  (a=n, b=o1u)
            nbx = nbx + (s["o1y"] * o2rbz - s["o1z"] * o2rby)
            nby = nby + (s["o1z"] * o2rbx - s["o1x"] * o2rbz)
            nbz = nbz + (s["o1x"] * o2rby - s["o1y"] * o2rbx)
            o1bx = o1bx + (o2rby * s["nzv"] - o2rbz * s["nyv"])
            o1by = o1by + (o2rbz * s["nxv"] - o2rbx * s["nzv"])
            o1bz = o1bz + (o2rbx * s["nyv"] - o2rby * s["nxv"])
            # o1 = normalize(o1raw), o1raw = (ny, nz - nx, -ny)
            o1d = (s["o1x"] * o1bx + s["o1y"] * o1by + s["o1z"] * o1bz)
            o1rbx = s["inv1"] * (o1bx - s["o1x"] * o1d)
            o1rby = s["inv1"] * (o1by - s["o1y"] * o1d)
            o1rbz = s["inv1"] * (o1bz - s["o1z"] * o1d)
            nbx = nbx - o1rby
            nby = nby + o1rbx - o1rbz
            nbz = nbz + o1rby
            # ---- shared Bragg-angle chain (d-spacing + wavelength) ---
            d_s = s["d_s"]
            lam = s["lam"]
            inr = (s["sin_b"] > 0.0) & (s["sin_b"] < 1.0)
            ds_b = sinb_b_tot * (-lam / (2.0 * jnp.maximum(
                d_s * d_s, _EPS)))
            add_slot(base + 13, jnp.where(inr, ds_b, 0.0) * mf)
            lamb = lamb + jnp.where(
                inr, sinb_b_tot / (2.0 * jnp.maximum(d_s, _EPS)), 0.0
            ) * mf
            dbx, dby, dbz = d0bx, d0by, d0bz

        # ---- local coords reverse (image seeds; bounds have no grad) ----
        if o["image"] is not None:
            im = o["image"]
            lxb = lxb * im["inv_ps"]
            lyb = lyb * im["inv_ps"]
        # lx = bx . (q - o); ly = by . (q - o)
        rxq = s["qx"] - oxp
        ryq = s["qy"] - oyp
        rzq = s["qz"] - ozp
        qbx = qbx + lxb * bxx + lyb * byx
        qby = qby + lxb * bxy + lyb * byy
        qbz = qbz + lxb * bxz + lyb * byz
        add_slot(base + 0, -(lxb * bxx + lyb * byx))
        add_slot(base + 1, -(lxb * bxy + lyb * byy))
        add_slot(base + 2, -(lxb * bxz + lyb * byz))
        add_slot(base + 3, lxb * rxq)
        add_slot(base + 4, lxb * ryq)
        add_slot(base + 5, lxb * rzq)
        add_slot(base + 6, lyb * rxq)
        add_slot(base + 7, lyb * ryq)
        add_slot(base + 8, lyb * rzq)

        # ---- normal reverse ---------------------------------------------
        axbx = axby = axbz = zeros  # adjoint of the bx row (cylinder axis)
        if o["shape"] == "sphere":
            # n = sgn * (C - q) / r
            inv_r = s["inv_r"]
            sgn = s["sgn"]
            Cbx = sgn * inv_r * nbx
            Cby = sgn * inv_r * nby
            Cbz = sgn * inv_r * nbz
            qbx = qbx - Cbx
            qby = qby - Cby
            qbz = qbz - Cbz
            ndot = (s["nxv"] * nbx + s["nyv"] * nby + s["nzv"] * nbz)
            r_b_n = -ndot * inv_r * s["r"] * inv_r  # = -(n.nb)/r
        elif o["shape"] == "cylinder":
            # n = normalize(u), u = tc - (tc.ax) ax, tc = C - q.
            inv_u = s["inv_u"]
            ndot = (s["nxv"] * nbx + s["nyv"] * nby + s["nzv"] * nbz)
            ubx = inv_u * (nbx - s["nxv"] * ndot)
            uby = inv_u * (nby - s["nyv"] * ndot)
            ubz = inv_u * (nbz - s["nzv"] * ndot)
            au = _dot3(ubx, uby, ubz, bxx, bxy, bxz)
            tcbx = ubx - au * bxx
            tcby = uby - au * bxy
            tcbz = ubz - au * bxz
            axbx = axbx - au * s["tcx"] - s["along"] * ubx
            axby = axby - au * s["tcy"] - s["along"] * uby
            axbz = axbz - au * s["tcz"] - s["along"] * ubz
            Cbx, Cby, Cbz = tcbx, tcby, tcbz
            qbx = qbx - tcbx
            qby = qby - tcby
            qbz = qbz - tcbz
            r_b_n = zeros  # normalize(u) carries no explicit r dependence
        elif o["shape"] == "torus":
            # n = normalize(m), m = pt - r_maj * u, u = normalize(pl),
            # pl = pt - (pt . by) by, pt = q - C.
            inv_m = s["inv_m"]
            ndot = (s["nxv"] * nbx + s["nyv"] * nby + s["nzv"] * nbz)
            mbx = inv_m * (nbx - s["nxv"] * ndot)
            mby = inv_m * (nby - s["nyv"] * ndot)
            mbz = inv_m * (nbz - s["nzv"] * ndot)
            ptbx, ptby, ptbz = mbx, mby, mbz
            ubx = -s["r_maj"] * mbx
            uby = -s["r_maj"] * mby
            ubz = -s["r_maj"] * mbz
            r_b_n = -(mbx * s["tux"] + mby * s["tuy"] + mbz * s["tuz"])
            udot = (s["tux"] * ubx + s["tuy"] * uby + s["tuz"] * ubz)
            plbx = s["inv_pl"] * (ubx - s["tux"] * udot)
            plby = s["inv_pl"] * (uby - s["tuy"] * udot)
            plbz = s["inv_pl"] * (ubz - s["tuz"] * udot)
            ptbx = ptbx + plbx
            ptby = ptby + plby
            ptbz = ptbz + plbz
            dyax_b = -(plbx * byx + plby * byy + plbz * byz)
            # by_b from pl = pt - dy_ax*by and dy_ax = pt . by
            add_slot(base + 6, -s["dy_ax"] * plbx + dyax_b * s["ptx"])
            add_slot(base + 7, -s["dy_ax"] * plby + dyax_b * s["pty"])
            add_slot(base + 8, -s["dy_ax"] * plbz + dyax_b * s["ptz"])
            ptbx = ptbx + dyax_b * byx
            ptby = ptby + dyax_b * byy
            ptbz = ptbz + dyax_b * byz
            qbx = qbx + ptbx
            qby = qby + ptby
            qbz = qbz + ptbz
            Cbx, Cby, Cbz = -ptbx, -ptby, -ptbz
        else:
            # n = bz row (constant per ray)
            add_slot(base + 9, nbx)
            add_slot(base + 10, nby)
            add_slot(base + 11, nbz)
            Cbx = Cby = Cbz = zeros
            r_b_n = zeros

        # ---- hit reverse: q = p + t d -----------------------------------
        t = s["t"]
        d0x, d0y, d0z = s["dpre"]
        t_b = _dot3(qbx, qby, qbz, d0x, d0y, d0z)
        pbx_new = qbx
        pby_new = qby
        pbz_new = qbz
        dbx = dbx + t * qbx
        dby = dby + t * qby
        dbz = dbz + t * qbz

        # ---- t reverse ---------------------------------------------------
        if o["shape"] == "plane":
            D = s["D"]
            # t = ((o - p) . bz) / (d . bz)
            invD = 1.0 / D
            pbx_new = pbx_new - t_b * bzx * invD
            pby_new = pby_new - t_b * bzy * invD
            pbz_new = pbz_new - t_b * bzz * invD
            dbx = dbx - t_b * t * bzx * invD
            dby = dby - t_b * t * bzy * invD
            dbz = dbz - t_b * t * bzz * invD
            add_slot(base + 0, t_b * bzx * invD)
            add_slot(base + 1, t_b * bzy * invD)
            add_slot(base + 2, t_b * bzz * invD)
            # dt/d bz = ((o - p) - t d)/D = (o - q)/D  (since q = p + t d).
            add_slot(base + 9, t_b * (oxp - s["qx"]) * invD)
            add_slot(base + 10, t_b * (oyp - s["qy"]) * invD)
            add_slot(base + 11, t_b * (ozp - s["qz"]) * invD)
        elif o["shape"] == "cylinder":
            # Implicit differentiation of qa t^2 + qb t + qc = 0 at the
            # SELECTED root: F'(t) = 2 qa t + qb (= +-sqrt(disc); grazing
            # rays guarded), so abar = -t_b t^2 / F' etc. — no need to
            # differentiate the stable-quadratic root-selection form.
            Fp = 2.0 * s["qa"] * t + s["qb"]
            sgF = jnp.where(Fp >= 0.0, 1.0, -1.0)
            Fp = jnp.where(jnp.abs(Fp) > 1e-9, Fp, sgF * 1e-9)
            ab = -t_b * t * t / Fp
            bb = -t_b * t / Fp
            cb = -t_b / Fp
            A1bx = 2.0 * ab * s["A1x"] + 2.0 * bb * s["B1x"]
            A1by = 2.0 * ab * s["A1y"] + 2.0 * bb * s["B1y"]
            A1bz = 2.0 * ab * s["A1z"] + 2.0 * bb * s["B1z"]
            B1bx = 2.0 * bb * s["A1x"] + 2.0 * cb * s["B1x"]
            B1by = 2.0 * bb * s["A1y"] + 2.0 * cb * s["B1y"]
            B1bz = 2.0 * bb * s["A1z"] + 2.0 * cb * s["B1z"]
            r_b = r_b_n - 2.0 * cb * s["r"]
            # A1 = d - (d.ax) ax
            aA = _dot3(A1bx, A1by, A1bz, bxx, bxy, bxz)
            dbx = dbx + A1bx - aA * bxx
            dby = dby + A1by - aA * bxy
            dbz = dbz + A1bz - aA * bxz
            axbx = axbx - aA * d0x - s["d_ax"] * A1bx
            axby = axby - aA * d0y - s["d_ax"] * A1by
            axbz = axbz - aA * d0z - s["d_ax"] * A1bz
            # B1 = dp - (dp.ax) ax, dp = p - C
            aB = _dot3(B1bx, B1by, B1bz, bxx, bxy, bxz)
            dpbx = B1bx - aB * bxx
            dpby = B1by - aB * bxy
            dpbz = B1bz - aB * bxz
            axbx = axbx - aB * s["dpx"] - s["p_ax"] * B1bx
            axby = axby - aB * s["dpy"] - s["p_ax"] * B1by
            axbz = axbz - aB * s["dpz"] - s["p_ax"] * B1bz
            pbx_new = pbx_new + dpbx
            pby_new = pby_new + dpby
            pbz_new = pbz_new + dpbz
            Cbx = Cbx - dpbx
            Cby = Cby - dpby
            Cbz = Cbz - dpbz
            # C = o + sign_c * r * bz
            sign_c = -1.0 if o["convex"] else 1.0
            add_slot(base + 0, Cbx)
            add_slot(base + 1, Cby)
            add_slot(base + 2, Cbz)
            add_slot(base + 9, sign_c * s["r"] * Cbx)
            add_slot(base + 10, sign_c * s["r"] * Cby)
            add_slot(base + 11, sign_c * s["r"] * Cbz)
            add_slot(
                base + 12,
                r_b + sign_c * (bzx * Cbx + bzy * Cby + bzz * Cbz),
            )
            add_slot(base + 3, axbx)
            add_slot(base + 4, axby)
            add_slot(base + 5, axbz)
        elif o["shape"] == "torus":
            # t = where(m_int, t0 - G/Gp, 0) at the CONSTANT converged
            # t0 (stop-gradient): the implicit-function derivative
            # dt/dtheta = -G_theta/Gp plus the exact quotient-rule term
            # through Gp (G ~ 0 but not exactly 0 at 4 iterations).
            mi = s["m_int"].astype(zeros.dtype)
            tb_ = t_b * mi
            Gp = s["Gp_t"]
            G_b = -tb_ / Gp
            gpok = (jnp.abs(Gp) > 1e-9).astype(zeros.dtype)
            Gp_b = gpok * tb_ * s["G"] / (Gp * Gp)
            rr = s["rr"]
            rhop = s["rhop"]
            rho = s["rho"]
            X, Y, Z = s["X"], s["Y"], s["Z"]
            Dlx_, Dly_, Dlz_ = s["Dlx"], s["Dly"], s["Dlz"]
            # Gp = 2 rr rhop + 2 Y Dly ; G = rr^2 + Y^2 - rmn^2
            rr_b = 2.0 * rhop * Gp_b + 2.0 * rr * G_b
            rhop_b = 2.0 * rr * Gp_b
            Y_b = 2.0 * Dly_ * Gp_b + 2.0 * Y * G_b
            Dly_b = 2.0 * Y * Gp_b
            rmn_b = -2.0 * s["rmn"] * G_b
            # rhop = (X Dlx + Z Dlz)/rho ; rr = rho - r_maj
            X_b = rhop_b * Dlx_ / rho
            Dlx_b = rhop_b * X / rho
            Z_b = rhop_b * Dlz_ / rho
            Dlz_b = rhop_b * Z / rho
            rho_b = -rhop_b * rhop / rho + rr_b
            rmaj_b = r_b_n - rr_b
            # rho = sqrt(X^2 + Z^2)
            X_b = X_b + rho_b * X / rho
            Z_b = Z_b + rho_b * Z / rho
            # X = Olx + t0 Dlx (t0 constant), etc.
            t0s = s["t0s"]
            Olx_b, Oly_b, Olz_b = X_b, Y_b, Z_b
            Dlx_b = Dlx_b + t0s * X_b
            Dly_b = Dly_b + t0s * Y_b
            Dlz_b = Dlz_b + t0s * Z_b
            # Ol* = (p - C) . b_row ; Dl* = d . b_row
            pbx_new = pbx_new + Olx_b * bxx + Oly_b * byx + Olz_b * bzx
            pby_new = pby_new + Olx_b * bxy + Oly_b * byy + Olz_b * bzy
            pbz_new = pbz_new + Olx_b * bxz + Oly_b * byz + Olz_b * bzz
            Cbx = Cbx - (Olx_b * bxx + Oly_b * byx + Olz_b * bzx)
            Cby = Cby - (Olx_b * bxy + Oly_b * byy + Olz_b * bzy)
            Cbz = Cbz - (Olx_b * bxz + Oly_b * byz + Olz_b * bzz)
            dbx = dbx + Dlx_b * bxx + Dly_b * byx + Dlz_b * bzx
            dby = dby + Dlx_b * bxy + Dly_b * byy + Dlz_b * bzy
            dbz = dbz + Dlx_b * bxz + Dly_b * byz + Dlz_b * bzz
            add_slot(base + 3, Olx_b * s["rx"] + Dlx_b * d0x)
            add_slot(base + 4, Olx_b * s["ry"] + Dlx_b * d0y)
            add_slot(base + 5, Olx_b * s["rz"] + Dlx_b * d0z)
            add_slot(base + 6, Oly_b * s["rx"] + Dly_b * d0x)
            add_slot(base + 7, Oly_b * s["ry"] + Dly_b * d0y)
            add_slot(base + 8, Oly_b * s["rz"] + Dly_b * d0z)
            # C = o + cs * Rmj * bz ; r_maj = Rmj + madj * rmn
            cs_ = o["center_sign"]
            add_slot(base + 0, Cbx)
            add_slot(base + 1, Cby)
            add_slot(base + 2, Cbz)
            add_slot(base + 9, Olz_b * s["rx"] + Dlz_b * d0x
                     + cs_ * s["Rmj"] * Cbx)
            add_slot(base + 10, Olz_b * s["ry"] + Dlz_b * d0y
                     + cs_ * s["Rmj"] * Cby)
            add_slot(base + 11, Olz_b * s["rz"] + Dlz_b * d0z
                     + cs_ * s["Rmj"] * Cbz)
            Cdotbz = Cbx * bzx + Cby * bzy + Cbz * bzz
            add_slot(base + 12, cs_ * Cdotbz + rmaj_b)
            add_slot(base + 16, rmn_b + o["major_adjust"] * rmaj_b)
        else:
            # sphere: t = t_ca -+ t_hc, L = C - p
            t_hc = jnp.maximum(s["t_hc"], 1e-6)
            sign_hc = -1.0 if o["convex"] else 1.0
            # dt/dL = d + sign_hc * (t_ca d - L)/t_hc
            cx = d0x + sign_hc * (s["t_ca"] * d0x - s["Lx"]) / t_hc
            cy = d0y + sign_hc * (s["t_ca"] * d0y - s["Ly"]) / t_hc
            cz = d0z + sign_hc * (s["t_ca"] * d0z - s["Lz"]) / t_hc
            Cbx = Cbx + t_b * cx
            Cby = Cby + t_b * cy
            Cbz = Cbz + t_b * cz
            pbx_new = pbx_new - t_b * cx
            pby_new = pby_new - t_b * cy
            pbz_new = pbz_new - t_b * cz
            # dt/dd = L + sign_hc * t_ca * L / t_hc
            dbx = dbx + t_b * s["Lx"] * (1.0 + sign_hc * s["t_ca"] / t_hc)
            dby = dby + t_b * s["Ly"] * (1.0 + sign_hc * s["t_ca"] / t_hc)
            dbz = dbz + t_b * s["Lz"] * (1.0 + sign_hc * s["t_ca"] / t_hc)
            # dt/dr = sign_hc * r / t_hc
            r_b = r_b_n + t_b * sign_hc * s["r"] / t_hc
            # C = o + sign_c * r * bz
            sign_c = -1.0 if o["convex"] else 1.0
            add_slot(base + 0, Cbx)
            add_slot(base + 1, Cby)
            add_slot(base + 2, Cbz)
            add_slot(base + 9, sign_c * s["r"] * Cbx)
            add_slot(base + 10, sign_c * s["r"] * Cby)
            add_slot(base + 11, sign_c * s["r"] * Cbz)
            add_slot(
                base + 12,
                r_b + sign_c * (bzx * Cbx + bzy * Cby + bzz * Cbz),
            )

        # Rays dead BEFORE this optic carry no adjoint through it: the
        # primal is where(mask, new, old); dead rays pass p, d, w through
        # unchanged. mask here is the post-optic mask; rays that died AT
        # this optic still have defined t/q (positions move), but their
        # weight never reaches an image, so their seeds are zero and all
        # adjoints vanish by linearity. Masked passthrough of state:
        pbx, pby, pbz = pbx_new, pby_new, pbz_new
    return gslots, wb, lamb


# ---------------------------------------------------------------------------
# Kernel builders.
# ---------------------------------------------------------------------------

def build_fused_diff(pipeline, num_iter: int | None = None,
                     chunk: int = 32768, interpret: bool = False,
                     rng: str | None = None):
    """Compile the forward and adjoint kernels for a pipeline.

    Returns ``(forward, vjp, pack, spec)``:
    ``forward(pvec, key) -> {"image": {name: [nx, ny]}}``;
    ``vjp(pvec, key, g_images: {name: [nx, ny]}) -> gvec``;
    ``pack(params) -> pvec``. Both functions re-generate identical rays
    from the same key (same per-chunk seeds and draw order), so ``gvec``
    is the exact gradient of ``sum(g * forward(pvec, key))`` w.r.t. the
    packed parameters.
    """
    g = pipeline.general
    if str(g.get("interact_mode", "mc")).lower() != "weight":
        raise FusedGradUnsupported("interact_mode must be 'weight'")
    if str(g.get("dtype", "float32")).lower() not in ("float32", "f32"):
        raise FusedGradUnsupported("dtype != float32")

    src = _grad_source_spec(pipeline.source)
    optics = [_grad_optic_spec(o) for o in pipeline.optics]
    if not any(o["image"] is not None for o in optics):
        raise FusedGradUnsupported("no imaged optic")
    if num_iter is None:
        num_iter = int(g["number_of_iter"])
    if chunk % (8 * 128) != 0:
        raise ValueError("chunk must be a multiple of 1024")
    n_total = src["intensity"] * num_iter
    n_chunks = -(-n_total // chunk)
    sub = chunk // 8
    is_plasma = src.get("kind") == "plasma"
    src_base = len(optics) * SLOTS_PER_OPTIC
    n_slots = _round_up(src_base + (SRC_SLOTS if is_plasma else 0), 8)
    if n_slots > 1024:
        raise FusedGradUnsupported("more than 42 optics")
    n_draws = src["n_draws"] + sum(o.get("n_draws", 0) for o in optics)
    images = [(i, o["image"]) for i, o in enumerate(optics) if o["image"]]
    # File rocking curves ride as (1, K) VMEM inputs (kernels cannot
    # capture array constants); the spec keeps each curve's slot index.
    tables = []
    for o in optics:
        rk = o.get("rocking")
        if rk is not None and rk.get("type") == "file":
            rk["slot"] = len(tables)
            tables.append(np.asarray(rk.pop("table"))[None, :])

    if rng is None:
        rng = "input" if interpret else "hw"
    f32 = jnp.float32

    def make_kernel(backward: bool):
        def kernel(*refs):
            rest = list(refs)
            seed_ref = rest.pop(0)
            params_ref = rest.pop(0)
            if rng == "input":
                rng_ref = rest.pop(0)
            table_vals = [rest.pop(0)[:] for _ in tables]
            if backward:
                g_refs = rest[:len(images)]
                out_ref = rest[len(images)]
            else:
                image_refs = rest[:len(images)]
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _init():
                if backward:
                    out_ref[:] = jnp.zeros_like(out_ref)
                else:
                    for ref in image_refs:
                        ref[:] = jnp.zeros_like(ref)

            if rng == "hw":
                pltpu.prng_seed(
                    seed_ref[0], seed_ref[1] + step * (-1640531535)
                )
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

            P = [params_ref[j] for j in range(n_slots)]
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 1)
            ray_index = step * chunk + rows * sub + cols
            alive = ray_index < n_total

            if is_plasma:
                (px, py, pz, dx, dy, dz, lam, w0v,
                 aux) = _sample_plasma(src, draw, sub, P, src_base)
            else:
                px, py, pz, dx, dy, dz, lam = _sample_source(
                    src, draw, sub)
                w0v, aux = None, None

            saved, images_data, _final = _trace_fwd(
                optics, src, P, px, py, pz, dx, dy, dz, alive,
                lam=lam, need_saved=backward, tables=table_vals,
                w0=w0v, draw=draw,
            )

            if not backward:
                for ref, (oi, w_img, fx, fy) in zip(
                    image_refs, images_data
                ):
                    im = optics[oi]["image"]
                    xb = jax.lax.broadcasted_iota(
                        jnp.int32, (im["nx_pad"], sub), 0).astype(f32)
                    yb = jax.lax.broadcasted_iota(
                        jnp.int32, (im["ny_pad"], sub), 0).astype(f32)
                    fxc = jnp.clip(fx, -2.0, im["nx"] + 1.0)
                    fyc = jnp.clip(fy, -2.0, im["ny"] + 1.0)
                    acc = jnp.zeros((im["nx_pad"], im["ny_pad"]), f32)
                    for s in range(8):
                        oxs = (jnp.maximum(
                            0.0, 1.0 - jnp.abs(fxc[s][None, :] - xb))
                            * w_img[s][None, :])
                        oys = jnp.maximum(
                            0.0, 1.0 - jnp.abs(fyc[s][None, :] - yb))
                        acc += jax.lax.dot_general(
                            oxs, oys,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=f32,
                        )
                    ref[:] += acc
                return

            # ---- adjoint seeds at imaged optics -------------------------
            seeds = {}
            for gref, (oi, w_img, fx, fy) in zip(g_refs, images_data):
                im = optics[oi]["image"]
                gmat = gref[:]
                xb = jax.lax.broadcasted_iota(
                    jnp.int32, (im["nx_pad"], sub), 0).astype(f32)
                yb = jax.lax.broadcasted_iota(
                    jnp.int32, (im["ny_pad"], sub), 0).astype(f32)
                fxc = jnp.clip(fx, -2.0, im["nx"] + 1.0)
                fyc = jnp.clip(fy, -2.0, im["ny"] + 1.0)
                gw = jnp.zeros((8, sub), f32)
                gpx = jnp.zeros((8, sub), f32)
                gpy = jnp.zeros((8, sub), f32)
                for s in range(8):
                    dxt = fxc[s][None, :] - xb        # (nx_pad, sub)
                    tx = jnp.maximum(0.0, 1.0 - jnp.abs(dxt))
                    dtx = jnp.where(jnp.abs(dxt) < 1.0, -jnp.sign(dxt),
                                    0.0)
                    dyt = fyc[s][None, :] - yb
                    ty = jnp.maximum(0.0, 1.0 - jnp.abs(dyt))
                    dty = jnp.where(jnp.abs(dyt) < 1.0, -jnp.sign(dyt),
                                    0.0)
                    # gy[i, r] = sum_j g[i, j] ty[j, r]
                    gy = jax.lax.dot_general(
                        gmat, ty,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )  # (nx_pad, sub)
                    u_w = jnp.sum(tx * gy, axis=0)       # (sub,)
                    u_px = jnp.sum(dtx * gy, axis=0)
                    gy2 = jax.lax.dot_general(
                        gmat, dty,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    u_py = jnp.sum(tx * gy2, axis=0)
                    sel = (rows == s).astype(f32)
                    gw = gw + sel * u_w[None, :]
                    gpx = gpx + sel * (u_px[None, :])
                    gpy = gpy + sel * (u_py[None, :])
                seeds[oi] = (gw, gpx * w_img, gpy * w_img)

            gslots, wbf, lam_bf = _trace_bwd(optics, src, P, saved,
                                             seeds)
            for j, val in _source_slot_grads(
                    src, src_base, wbf, lam_bf, aux).items():
                gslots[j] = gslots.get(j, 0.0) + val

            orow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            ocol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            upd = jnp.zeros((8, 128), f32)
            for j, val in gslots.items():
                tot = jnp.sum(val)
                upd = upd + jnp.where(
                    (orow == j // 128) & (ocol == j % 128), tot, 0.0
                )
            out_ref[:] += upd

        return kernel

    in_specs_common = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (2,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # params (n_slots,)
    ]
    if rng == "input":
        in_specs_common.append(
            pl.BlockSpec((None, n_draws, 8, sub), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    for tab in tables:
        in_specs_common.append(
            pl.BlockSpec(tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    table_args = [jnp.asarray(t) for t in tables]
    interp = True if (interpret and rng == "input") else (
        pltpu.InterpretParams() if interpret else False
    )

    # forward call
    fwd_out_shapes = [
        jax.ShapeDtypeStruct((im["nx_pad"], im["ny_pad"]), f32)
        for _, im in images
    ]
    fwd_out_specs = [
        pl.BlockSpec((im["nx_pad"], im["ny_pad"]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for _, im in images
    ]
    # The adjoint keeps every per-optic primal live across the sweep;
    # the default 16 MiB scoped budget overflows above chunk ~16k
    # (measured 35 MiB at chunk 131072). v5e VMEM is 128 MiB.
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    fwd_call = pl.pallas_call(
        make_kernel(False),
        grid=(n_chunks,),
        in_specs=list(in_specs_common),
        out_specs=fwd_out_specs,
        out_shape=fwd_out_shapes,
        compiler_params=cparams,
        interpret=interp,
    )

    bwd_in_specs = list(in_specs_common) + [
        pl.BlockSpec((im["nx_pad"], im["ny_pad"]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for _, im in images
    ]
    bwd_call = pl.pallas_call(
        make_kernel(True),
        grid=(n_chunks,),
        in_specs=bwd_in_specs,
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), f32),
        compiler_params=cparams,
        interpret=interp,
    )

    image_names = [optics[i]["name"] for i, _ in images]
    image_dims = [(im["nx"], im["ny"]) for _, im in images]

    def _seed_and_uniforms(key):
        seed = jax.random.randint(
            key, (2,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        )
        if rng == "input":
            uniforms = jax.random.uniform(
                key, (n_chunks, n_draws, 8, sub), dtype=f32
            )
            return seed, (uniforms,)
        return seed, ()

    @jax.jit
    def forward(pvec, key):
        seed, extra = _seed_and_uniforms(key)
        imgs = fwd_call(seed, pvec.astype(f32), *extra, *table_args)
        return {
            "image": {
                name: img[:nx, :ny]
                for name, (nx, ny), img in zip(
                    image_names, image_dims, imgs
                )
            }
        }

    @jax.jit
    def vjp(pvec, key, g_images):
        seed, extra = _seed_and_uniforms(key)
        gs = []
        for name, (nx, ny), (_, im) in zip(image_names, image_dims,
                                           images):
            gfull = jnp.zeros((im["nx_pad"], im["ny_pad"]), f32)
            gs.append(gfull.at[:nx, :ny].set(
                jnp.asarray(g_images[name], f32)))
        out = bwd_call(seed, pvec.astype(f32), *extra, *table_args, *gs)
        return out.reshape(-1)[:n_slots]

    spec = {"optics": optics, "src": src, "n_slots": n_slots,
            "n_total": n_total, "n_chunks": n_chunks, "chunk": chunk,
            "image_names": image_names, "tables": table_args,
            "n_draws": n_draws}
    return forward, vjp, pack_params(pipeline), spec
