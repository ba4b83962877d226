"""Plasma sources: real-units photon emission from bundle distributions.

TPU-native rebuild of ``xicsrt/sources/_XicsrtPlasmaGeneric.py`` and its
profile subclasses. The reference instantiates one ``XicsrtSourceFocused``
object *per bundle* in a Python loop (``create_sources`` :286-345 — a
measured hot spot); here the whole pipeline is one fixed-shape device
computation:

1. bundle origins/profiles are sampled as dense [B] arrays;
2. per-bundle expected photon counts lambda_i follow the reference's
   real-units formula: emissivity * time_resolution * bundle_volume *
   solid_angle/(4 pi), rescaled by volume/(bundle_count*bundle_volume)
   (:301-319);
3. per-bundle Poisson counts are drawn on device and converted to a per-ray
   bundle assignment via cumsum + searchsorted (Poisson total + multinomial
   split == independent Poissons, so photon statistics are preserved);
4. ray origins/directions/wavelengths are gathered per-bundle and sampled
   elementwise (per-ray cone half-angle, per-ray Doppler temperature).

The ray array size is a *static* budget estimated at setup; overflow rays
(beyond budget) are dropped and counted (six-sigma headroom makes this
astronomically rare at the default settings).

Wavelength sampling uses the exact Voigt decomposition
(Gaussian(sigma_b) + Cauchy(gamma) sum) instead of the reference's clipped
CDF table — exact tails, and sigma may vary per ray.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from xicsrt_tpu.dispatch import register
from xicsrt_tpu.ops import vector as vec
from xicsrt_tpu.ops import voigt as voigt_ops
from xicsrt_tpu.rays import Rays
from xicsrt_tpu.sources.generic import SourceGeneric, poisson_budget

_C_LIGHT = 299792458.0


def _solid_angle_cone(theta):
    """Solid angle of a cone of half-angle theta (vectorized)."""
    return 4.0 * jnp.pi * jnp.sin(theta / 2.0) ** 2


@register("XicsrtPlasmaGeneric", "plasma_generic")
class PlasmaGeneric(SourceGeneric):
    """Bundle-based plasma emitter (uniform profiles unless subclassed)."""

    def default_config(self) -> dict:
        """
        Config mirrors ``XicsrtPlasmaGeneric.default_config`` (:44-158):
        box sizes, angular_dist (isotropic only), spread | spread_radius,
        target, emissivity [ph/m^3/s], temperature [eV], velocity,
        time_resolution [s], bundle_type ('voxel'|'point'), bundle_volume,
        bundle_count, max_rays, max_bundles, filters; plus the wavelength
        options inherited from the generic source.
        """
        config = super().default_config()
        config["spread"] = None
        config["spread_radius"] = None
        config["target"] = None
        config["emissivity"] = 0.0
        config["velocity"] = np.array([0.0, 0.0, 0.0])
        config["time_resolution"] = 1e-3
        config["bundle_type"] = "voxel"
        config["bundle_volume"] = 1e-6
        config["bundle_count"] = None
        config["max_rays"] = int(1e7)
        config["max_bundles"] = int(1e7)
        # 'auto' | 'matmul' | 'gather': how per-ray bundle attributes are
        # assembled. TPU gathers cost ~55 ns/element (measured: 300 ms of a
        # 390 ms generate at N=5.6e6); 'matmul' contracts an interval
        # one-hot against the bundle table on the MXU instead. 'auto' picks
        # matmul on TPU when bundle_count <= 4096.
        config["bundle_gather"] = "auto"
        # intensity/use_poisson inherited; plasma determines intensity itself.
        config["use_poisson"] = True
        return config

    def check_config(self):
        super().check_config()
        if self.config.get("angular_dist", "isotropic") != "isotropic":
            raise NotImplementedError(
                "Plasma sources currently support only isotropic emission "
                "(matching the reference warning, _XicsrtPlasmaGeneric.py:55-62)."
            )

    def initialize(self):
        # Deliberately skip SourceGeneric.initialize (intensity handling
        # differs); replicate the relevant parts.
        self.param["volume"] = (
            float(self.param["xsize"])
            * float(self.param["ysize"])
            * float(self.param["zsize"])
        )
        bundle_count = self.param["bundle_count"]
        if bundle_count is None:
            bundle_count = self.param["volume"] / float(self.param["bundle_volume"])
        self.bundle_count = int(round(float(bundle_count)))
        if self.bundle_count < 1:
            raise ValueError("Bundle volume is larger than the plasma volume.")
        if self.bundle_count > int(self.param["max_bundles"]):
            raise ValueError(
                f"Current settings will produce too many bundles "
                f"({self.bundle_count:0.2e}). Increase bundle_volume, set "
                f"bundle_count, or increase max_bundles."
            )
        if self.param["bundle_type"] not in ("voxel", "point"):
            raise ValueError(f'Unknown bundle_type: {self.param["bundle_type"]}')
        self.voxel_size = (
            float(self.param["bundle_volume"]) ** (1.0 / 3.0)
            if self.param["bundle_type"] == "voxel"
            else 0.0
        )
        if self.param["target"] is None:
            raise ValueError(f'Plasma "{self.name}": target is required.')
        if (self.param["spread"] is None) == (self.param["spread_radius"] is None):
            raise ValueError(
                "Exactly one of spread / spread_radius must be specified."
            )
        self._setup_wavelength_plasma()
        self.num_rays = self._estimate_budget()
        if self.param["max_rays"] and self.num_rays > int(self.param["max_rays"]):
            raise ValueError(
                f"Current settings predict too many rays "
                f"(budget {self.num_rays:0.2e} > max_rays "
                f"{int(self.param['max_rays']):0.2e}). Reduce integration "
                f"time or adjust other parameters."
            )

    # ------------------------------------------------------------------
    def _setup_wavelength_plasma(self):
        """Natural-linewidth gamma is global; Doppler sigma varies per ray."""
        self.voigt_table = None  # plasma samples Voigt exactly, no table
        self.gamma = voigt_ops.natural_gamma(
            float(self.param["linewidth"]), float(self.param["wavelength"])
        )

    # --- host-side expected-intensity estimate --------------------------
    def _host_profiles(self, origin_local: np.ndarray) -> tuple:
        """Numpy twin of the profile evaluation, for budget estimation.

        origin_local: [B, 3] bundle offsets in the plasma local frame.
        Returns (emissivity, mask).
        """
        B = origin_local.shape[0]
        return np.full(B, float(self.param["emissivity"])), np.ones(B, bool)

    def _estimate_budget(self) -> int:
        """Static ray budget from a host dry-run of the intensity formula."""
        rng = np.random.default_rng(12345)
        nb = min(self.bundle_count, 65536)
        sizes = np.array(
            [self.param["xsize"], self.param["ysize"], self.param["zsize"]],
            dtype=np.float64,
        )
        offsets = rng.uniform(-0.5, 0.5, (nb, 3)) * sizes
        emiss, mask = self._host_profiles(offsets)

        # Solid angle per bundle.
        if self.param["spread_radius"] is not None:
            origin = np.asarray(self.param["origin"], dtype=np.float64)
            # Local offsets -> global (approximate with local for the bound;
            # distances dominate over orientation).
            target = np.asarray(self.param["target"], dtype=np.float64)
            dist = np.linalg.norm((offsets + origin) - target, axis=1)
            spreads = np.arctan(float(self.param["spread_radius"]) / dist)
        else:
            spreads = np.full(nb, float(self.param["spread"]))
        omega = 4.0 * np.pi * np.sin(spreads / 2.0) ** 2

        lam = (
            emiss
            * float(self.param["time_resolution"])
            * float(self.param["bundle_volume"])
            * omega
            / (4.0 * np.pi)
        )
        lam *= self.param["volume"] / (self.bundle_count * float(self.param["bundle_volume"]))
        # Sharded runs divide the photon load per device (independent-
        # Poisson split); the static budget shrinks with it.
        lam *= float(self.param["intensity_scale"])
        lam = np.where(mask, lam, 0.0)
        predicted = float(lam.mean() * self.bundle_count)
        # Headroom: CLT spread across keys plus Poisson margin plus 15%.
        budget = poisson_budget(predicted * (1.0 + 5.0 / math.sqrt(max(nb, 1))) * 1.15)
        return max(int(budget), 16)

    # --- device-side profile evaluation ---------------------------------
    def make_profiles(self):
        """Returns fn(params, origin_global, origin_local, key) ->
        dict(emissivity, temperature, velocity[B,3], mask).

        Constant profiles read emissivity/temperature from the params
        pytree, so ``jax.grad`` flows through temperature into the
        Doppler width (emissivity reaches only the integer photon
        counts, which have no gradient — the fused-grad path
        differentiates emissivity through ray weights instead)."""

        def profiles(params, origin_global, origin_local, key):
            B = origin_global.shape[0]
            dtype = origin_global.dtype
            vel = jnp.broadcast_to(params["velocity"], (B, 3))
            return {
                "emissivity": jnp.broadcast_to(
                    jnp.asarray(params["emissivity"], dtype), (B,)),
                "temperature": jnp.broadcast_to(
                    jnp.asarray(params["temperature"], dtype), (B,)),
                "velocity": vel,
                "mask": jnp.ones((B,), dtype=bool),
            }

        return profiles

    def build_params(self) -> dict:
        params = super().build_params()
        params["target"] = self.as_array(self.param["target"], (3,))
        params["emissivity"] = self.as_array(self.param["emissivity"])
        params["temperature"] = self.as_array(self.param["temperature"])
        params["time_resolution"] = self.as_array(self.param["time_resolution"])
        return params

    # ------------------------------------------------------------------
    def make_bundle_tables(self, filter_fns=None):
        """Per-bundle sampling stage, shared by the XLA generator and the
        fused megakernel: bundle origins, profiles, filters, photon rates
        and Poisson counts — everything O(bundle_count).

        Returns ``fn(params, filter_params, k_bundle, k_prof, k_counts)
        -> (cum, table, total)`` with ``cum`` (B,) int32 inclusive
        cumulative counts, ``table`` (B, 8) f32 columns
        [origin xyz, spread, temperature, velocity xyz], and ``total``
        the realized photon count.
        """
        B = self.bundle_count
        dtype = self.dtype
        sizes = tuple(
            float(self.param[k] or 0.0) for k in ("xsize", "ysize", "zsize")
        )
        use_poisson = bool(self.param["use_poisson"])
        spread_static = self.param["spread"]
        spread_radius = self.param["spread_radius"]
        bundle_volume = float(self.param["bundle_volume"])
        time_res = float(self.param["time_resolution"])
        volume = float(self.param["volume"])
        intensity_scale = float(self.param["intensity_scale"])
        profiles_fn = self.make_profiles()
        filter_fns = filter_fns or []

        def bundle_tables(params, filter_params, k_bundle, k_prof, k_counts):
            frame = params["frame"]
            offsets = jax.random.uniform(
                k_bundle, (B, 3), dtype=dtype, minval=-0.5, maxval=0.5
            ) * jnp.asarray(sizes, dtype=dtype)
            b_origin = frame.point_to_external(offsets)

            prof = profiles_fn(params, b_origin, offsets, k_prof)
            b_mask = prof["mask"]
            for fkey, fn in filter_fns:
                b_mask = fn(filter_params[fkey], b_origin, b_mask)

            # Per-bundle cone spread and solid angle.
            if spread_radius is not None:
                dist = vec.magnitude(b_origin - params["target"][None, :])
                b_spread = jnp.arctan(spread_radius / dist)
            else:
                b_spread = jnp.full((B,), float(spread_static), dtype=dtype)
            omega = _solid_angle_cone(b_spread)

            # Expected photons per bundle (real units; :301-319).
            lam = (
                prof["emissivity"] * time_res * bundle_volume * omega
                / (4.0 * jnp.pi)
            ) * (volume / (B * bundle_volume)) * intensity_scale
            lam = jnp.where(b_mask, lam, 0.0)

            if use_poisson:
                counts = jax.random.poisson(k_counts, lam).astype(jnp.int32)
            else:
                counts = jnp.floor(lam).astype(jnp.int32)
            cum = jnp.cumsum(counts).astype(jnp.int32)
            table = jnp.concatenate(
                [
                    b_origin.astype(jnp.float32),
                    b_spread[:, None].astype(jnp.float32),
                    prof["temperature"][:, None].astype(jnp.float32),
                    prof["velocity"].astype(jnp.float32),
                ],
                axis=1,
            )  # (B, 8)
            return cum, table, cum[-1]

        return bundle_tables

    def make_generate(self, filter_fns=None):
        B = self.bundle_count
        N = self.num_rays
        dtype = self.dtype
        voxel = self.voxel_size
        wavelength0 = float(self.param["wavelength"])
        gamma = self.gamma
        mass_number = float(self.param["mass_number"])
        bundle_tables = self.make_bundle_tables(filter_fns)
        gather_mode = str(self.param.get("bundle_gather") or "auto").lower()
        if gather_mode not in ("auto", "matmul", "gather"):
            raise ValueError(f"Unknown bundle_gather: {gather_mode}")
        if gather_mode == "auto":
            # The one-hot contraction is O(N * B); beyond a few thousand
            # bundles the (fast-on-CPU) gather wins even on TPU.
            gather_mode = (
                "matmul"
                if jax.default_backend() == "tpu" and B <= 4096
                else "gather"
            )

        def generate(params, filter_params, key):
            frame = params["frame"]
            (k_bundle, k_prof, k_counts, k_voxel, k_dir,
             k_wave, k_cauchy) = jax.random.split(key, 7)

            cum, table, total = bundle_tables(
                params, filter_params, k_bundle, k_prof, k_counts
            )
            ray_idx = jnp.arange(N, dtype=jnp.int32)
            mask = ray_idx < jnp.minimum(total, N)

            if gather_mode == "matmul":
                # Interval-one-hot contraction on the MXU (Pallas kernel,
                # ops/bundle_gather.py): every per-bundle attribute a ray
                # needs rides one (8, B) x (B, sub) matvec whose one-hot
                # operand never leaves VMEM. Bit-identical to the indexed
                # gather; rays past the realized total get zero rows
                # (masked below anyway).
                from xicsrt_tpu.ops.bundle_gather import interval_gather

                attrs = interval_gather(
                    cum, table, N,
                    interpret=jax.default_backend() != "tpu",
                ).astype(dtype)
                r_origin = attrs[:, 0:3]
                theta = attrs[:, 3]
                r_temp = attrs[:, 4]
                r_vel = attrs[:, 5:8]
            else:
                bundle_id = jnp.searchsorted(cum, ray_idx, side="right")
                bundle_id = jnp.clip(bundle_id, 0, B - 1)
                attrs = table.astype(dtype)[bundle_id]
                r_origin = attrs[:, 0:3]
                theta = attrs[:, 3]
                r_temp = attrs[:, 4]
                r_vel = attrs[:, 5:8]

            # --- ray origins --------------------------------------------
            if voxel > 0.0:
                voxel_off = jax.random.uniform(
                    k_voxel, (N, 3), dtype=dtype, minval=-voxel / 2, maxval=voxel / 2
                )
                r_origin = r_origin + frame.vector_to_external(voxel_off)

            # --- directions: isotropic cone aimed at the target ---------
            normal = vec.safe_normalize(params["target"][None, :] - r_origin)
            ku, kphi = jax.random.split(k_dir)
            u = jax.random.uniform(ku, (N,), dtype=dtype)
            z = 1.0 - u * (1.0 - jnp.cos(theta))
            phi = jax.random.uniform(
                kphi, (N,), dtype=dtype, minval=0.0, maxval=2.0 * jnp.pi
            )
            rho = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
            local = jnp.stack(
                [rho * jnp.cos(phi), rho * jnp.sin(phi), z], axis=-1
            )
            basis = vec.orthogonal_basis(normal, frame.xaxis, frame.zaxis)
            direction = vec.rotate_to_frame(local, basis)

            # --- wavelengths: exact Voigt = Gauss(sigma_b) + Cauchy(gamma)
            sigma = (
                jnp.sqrt(
                    jnp.maximum(r_temp, 0.0)
                    * 1.602176634e-19
                    / (mass_number * 1.66053906892e-27 * _C_LIGHT**2)
                )
                * wavelength0
            )
            w = wavelength0 + sigma * jax.random.normal(k_wave, (N,), dtype=dtype)
            if gamma > 0.0:
                uc = jax.random.uniform(
                    k_cauchy, (N,), dtype=dtype, minval=1e-7, maxval=1.0 - 1e-7
                )
                w = w + gamma * jnp.tan(jnp.pi * (uc - 0.5))
            w = w * (1.0 - vec.dot(r_vel, direction) / _C_LIGHT)

            return Rays(
                origin=r_origin,
                direction=direction,
                wavelength=w,
                weight=jnp.ones((N,), dtype=dtype),
                mask=mask,
            )

        return generate


@register("XicsrtPlasmaCubic", "plasma_cubic")
class PlasmaCubic(PlasmaGeneric):
    """Constant emissivity/temperature throughout the box
    (cf. ``_XicsrtPlasmaCubic.py:23-35``)."""


@register("XicsrtPlasmaCylindrical", "plasma_cylindrical")
class PlasmaCylindrical(PlasmaGeneric):
    """1/r falloff profiles around the local y-axis.

    The radius uses the local (z, x) plane, matching the reference's
    coordinate shuffle (``_XicsrtPlasmaCylindrical.py:44-52``; the reference
    marks this class as an example).
    """

    def _host_profiles(self, origin_local):
        r = np.sqrt(origin_local[:, 2] ** 2 + origin_local[:, 0] ** 2)
        r = np.maximum(r, 1e-12)
        return float(self.param["emissivity"]) / r, np.ones(len(r), bool)

    def make_profiles(self):
        emissivity = float(self.param["emissivity"])
        temperature = float(self.param["temperature"])

        def profiles(params, origin_global, origin_local, key):
            B = origin_global.shape[0]
            r = jnp.sqrt(origin_local[:, 2] ** 2 + origin_local[:, 0] ** 2)
            r = jnp.maximum(r, 1e-12)
            vel = jnp.broadcast_to(params["velocity"], (B, 3))
            return {
                "emissivity": emissivity / r,
                "temperature": temperature / r,
                "velocity": vel,
                "mask": jnp.ones((B,), dtype=bool),
            }

        return profiles


@register("XicsrtPlasmaToroidal", "plasma_toroidal")
class PlasmaToroidal(PlasmaGeneric):
    """Toroidal flux-coordinate plasma with circular cross-section.

    rho = (distance from the torus axis circle) / minor_radius, evaluated in
    global coordinates around ``torus_origin`` with the torus axis along
    global z (cf. ``_XicsrtPlasmaToroidal.py:36-48``; the reference
    normalizes by sqrt(minor_radius) — dimensionally inconsistent — so this
    implementation uses the standard normalized minor radius instead).
    Profiles are constant inside rho <= 1 by default; subclasses override
    ``profile_*`` hooks.
    """

    def default_config(self) -> dict:
        config = super().default_config()
        config["major_radius"] = 0.0
        config["minor_radius"] = 0.0
        config["torus_origin"] = np.array([0.0, 0.0, 0.0])
        config["emissivity_scale"] = 1.0
        config["temperature_scale"] = 1.0
        config["velocity_scale"] = 1.0
        return config

    # --- profile hooks (numpy + jnp twins) ------------------------------
    def profile_emissivity(self, rho, xp):
        return xp.where(rho <= 1.0, float(self.param["emissivity"]), 0.0)

    def profile_temperature(self, rho, xp):
        return xp.where(rho <= 1.0, float(self.param["temperature"]), 1e-6)

    def _rho(self, points_global, xp):
        torus_origin = np.asarray(self.param["torus_origin"], dtype=np.float64)
        R = float(self.param["major_radius"])
        a = float(self.param["minor_radius"])
        p = points_global - xp.asarray(torus_origin)
        r_cyl = xp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
        d = xp.sqrt((r_cyl - R) ** 2 + p[..., 2] ** 2)
        return d / a

    def _host_profiles(self, origin_local):
        origin = np.asarray(self.param["origin"], dtype=np.float64)
        rho = self._rho(origin_local + origin, np)
        emiss = self.profile_emissivity(rho, np) * float(self.param["emissivity_scale"])
        return emiss, np.isfinite(emiss)

    # --- flux-coordinate interface (host-side, used by the visual layer) --
    # flx = (rho^2, poloidal angle, toroidal angle) with rho = d/a, the
    # standard normalized minor radius. Mirrors the reference interface
    # (``_XicsrtPlasmaToroidal.py:34-48``) — note the reference's own
    # flx_from_car/car_from_flx pair normalizes by sqrt(minor_radius) and
    # is not self-inverse; this pair is.
    def flx_from_car(self, point_car):
        p = np.asarray(point_car, dtype=np.float64) - np.asarray(
            self.param["torus_origin"], dtype=np.float64
        )
        r = np.hypot(p[..., 0], p[..., 1])
        d = r - float(self.param["major_radius"])
        rho = np.hypot(d, p[..., 2]) / float(self.param["minor_radius"])
        theta = np.arctan2(p[..., 2], d)
        phi = np.arctan2(p[..., 1], p[..., 0])
        return np.stack([rho**2, theta, phi], axis=-1)

    def rho_from_car(self, point_car):
        return np.sqrt(self.flx_from_car(point_car)[..., 0])

    def car_from_flx(self, point_flx):
        flx = np.asarray(point_flx, dtype=np.float64)
        d = np.sqrt(flx[..., 0]) * float(self.param["minor_radius"])
        R = float(self.param["major_radius"])
        r = R + d * np.cos(flx[..., 1])
        z = d * np.sin(flx[..., 1])
        car = np.stack(
            [r * np.cos(flx[..., 2]), r * np.sin(flx[..., 2]), z], axis=-1
        )
        return car + np.asarray(self.param["torus_origin"], dtype=np.float64)

    def make_profiles(self):
        e_scale = float(self.param["emissivity_scale"])
        t_scale = float(self.param["temperature_scale"])
        v_scale = float(self.param["velocity_scale"])

        def profiles(params, origin_global, origin_local, key):
            B = origin_global.shape[0]
            rho = self._rho(origin_global, jnp)
            emiss = self.profile_emissivity(rho, jnp) * e_scale
            temp = self.profile_temperature(rho, jnp) * t_scale
            vel = jnp.broadcast_to(params["velocity"], (B, 3)) * v_scale
            return {
                "emissivity": emiss,
                "temperature": temp,
                "velocity": vel,
                "mask": jnp.isfinite(temp) & jnp.isfinite(emiss),
            }

        return profiles


@register("XicsrtPlasmaToroidalDatafile", "plasma_toroidal_datafile")
class PlasmaToroidalDatafile(PlasmaToroidal):
    """Toroidal plasma with rho-profiles interpolated from text files
    (2-column: rho, value; cf. ``_XicsrtPlasmaToroidalDatafile.py:21-45``)."""

    def default_config(self) -> dict:
        config = super().default_config()
        config["emissivity_file"] = None
        config["temperature_file"] = None
        config["velocity_file"] = None
        return config

    def initialize(self):
        # Load tables before the budget estimate (which calls the profiles).
        self._emiss_table = self._load_table(self.param["emissivity_file"])
        self._temp_table = self._load_table(self.param["temperature_file"])
        super().initialize()

    @staticmethod
    def _load_table(filename):
        if filename is None:
            return None
        data = np.loadtxt(filename, dtype=np.float64)
        order = np.argsort(data[:, 0])
        return data[order, 0], data[order, 1]

    def profile_emissivity(self, rho, xp):
        if self._emiss_table is None:
            return super().profile_emissivity(rho, xp)
        x, y = self._emiss_table
        return xp.interp(rho, xp.asarray(x), xp.asarray(y), left=0.0, right=0.0)

    def profile_temperature(self, rho, xp):
        if self._temp_table is None:
            return super().profile_temperature(rho, xp)
        x, y = self._temp_table
        return xp.interp(rho, xp.asarray(x), xp.asarray(y), left=0.0, right=0.0)
