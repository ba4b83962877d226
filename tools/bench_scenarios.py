"""Honest per-scenario throughput table on the real TPU chip.

Re-measures the scenario table in docs/performance.md with the same
serialized-dispatch harness as bench.py (the round-1 numbers were inflated
by overlapping dispatches). One JSON line per scenario.

Usage: timeout 590 python tools/bench_scenarios.py [scenario ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _crystal(**kw):
    crystal = {
        "origin": [0.0, 0.0, 0.80374151],
        "zaxis": [0.0, 0.59497864, -0.80374151],
        "xsize": 0.2,
        "ysize": 0.2,
        "crystal_spacing": 2.45676,
        "rocking_type": "gaussian",
        "rocking_fwhm": 48.070e-6,
    }
    crystal.update(kw)
    return crystal


def _config(crystal, intensity, num_iter, **general):
    g = {"number_of_iter": num_iter, "random_seed": 0,
         "keep_history": False, "print_results": False}
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
            "crystal": crystal,
            "detector": {
                "class_name": "XicsrtOpticDetector",
                "origin": [0.0, 0.76871290, 0.56904832],
                "zaxis": [0.0, -0.95641806, 0.29200084],
                "xsize": 0.4,
                "ysize": 0.2,
            },
        },
    }


def _plasma_config(intensity, num_iter, bundle_count=1000):
    # time_resolution chosen so the EXPECTED photon count equals
    # `intensity`: N = emissivity * t * volume * sin^2(spread/2)
    # (cf. sources/plasma.py intensity formula and tests/test_plasma.py).
    emissivity = 1e16
    volume = 0.02**3
    omega_frac = np.sin(np.radians(10.0) / 2.0) ** 2
    t_res = intensity / (emissivity * volume * omega_frac)
    return {
        "general": {"number_of_iter": num_iter, "random_seed": 0,
                    "keep_history": False, "print_results": False},
        "sources": {
            "plasma": {
                "class_name": "XicsrtPlasmaCubic",
                "origin": [0.0, 0.0, 0.0],
                "xsize": 0.02, "ysize": 0.02, "zsize": 0.02,
                "target": [0.0, 0.0, 0.80374151],
                "spread": np.radians(10.0),
                "emissivity": emissivity,
                "temperature": 1000.0,
                "mass_number": 40.0,
                "wavelength": 3.9492,
                "time_resolution": t_res,
                "bundle_volume": 1e-6,
                "bundle_count": bundle_count,
                "max_bundles": max(bundle_count * 2, 10000),
                "use_poisson": True,
                # The static budget carries headroom above the expectation
                # (sources/plasma.py _estimate_budget); 1.5x covers it.
                "max_rays": int(intensity * 1.5 + 1e5),
            }
        },
        "optics": {
            "crystal": _crystal(
                class_name="XicsrtOpticToroidalCrystal",
                radius_major=1.0, radius_minor=0.64,
                rocking_fwhm=100e-6,
            ),
            "detector": {
                "class_name": "XicsrtOpticDetector",
                "origin": [0.0, 0.76871290, 0.56904832],
                "zaxis": [0.0, -0.95641806, 0.29200084],
                "xsize": 0.4, "ysize": 0.2,
            },
        },
    }


SCENARIOS = {
    "toroidal": lambda n, it: _config(
        _crystal(class_name="XicsrtOpticToroidalCrystal",
                 radius_major=1.0, radius_minor=0.2), n, it),
    "mosaic15": lambda n, it: _config(
        _crystal(class_name="XicsrtOpticSphericalMosaicCrystal",
                 radius=1.0, mosaic_spread=np.radians(0.05),
                 mosaic_depth=15, rocking_fwhm=150e-6), n, it),
    "mesh41": lambda n, it: _config(
        _crystal(class_name="XicsrtOpticMeshSphericalCrystal",
                 radius=1.0, mesh_size=(41, 41),
                 mesh_coarse_size=(11, 11)), n, it),
    "plasma_torus": _plasma_config,
    # Reference-scale plasma (1e5 bundles; _XicsrtPlasmaGeneric.py:155
    # defaults max_bundles=1e7): the page-windowed in-kernel gather.
    "plasma_100k": lambda n, it: _plasma_config(n, it, bundle_count=100000),
    "diff_fwd_bwd": lambda n, it: _config(
        _crystal(class_name="XicsrtOpticSphericalCrystal", radius=1.0),
        n, it),
    # Same physics, fused forward+backward kernels (ops/fused_grad.py).
    "fused_diff": lambda n, it: _config(
        _crystal(class_name="XicsrtOpticSphericalCrystal", radius=1.0),
        n, it),
}

# TPU v5e bf16 MXU peak; the same plausibility anchor as bench.py.
PEAK_FLOPS = 197e12


def _round_up(x, m):
    return -(-x // m) * m


def _flops_per_ray(pipeline, engine):
    """Countable per-ray FLOPs: exact binning MACs + per-stage estimates.

    Binning dominates the flagship (mfu 0.63 there is binning MACs alone);
    the per-shape/source VPU estimates below are rough transcendental-
    weighted op counts of the kernel stages (fused engine structure,
    ops/fused_trace.py) so sub-1e9 scenarios get an honest bound: a LOW
    mfu with a low VPU estimate says the scenario is latency/structure
    -bound, not that the MXU is busy.
    """
    # Exact MXU MACs: every enabled image contracts its FLAT-packed
    # accumulator dims per ray on the fused engine (~nx*ny; the padded
    # image-shaped layout was retired in round 5).
    if engine == "fused":
        from xicsrt_tpu.ops.fused_trace import image_macs_per_ray

        mpr = sum(
            image_macs_per_ray(nx, ny)
            for (nx, ny), _ in pipeline.image_specs().values()
        )
    else:
        mpr = sum(nx * ny for (nx, ny), _ in pipeline.image_specs().values())
    flops = 2.0 * mpr

    # VPU estimates per stage (multiply-add = 2; transcendental ~ 8).
    SOURCE = 150.0       # sampling: RNG, cone basis, trig, Doppler
    SHAPE = {
        "plane": 30.0, "sphere": 80.0, "cylinder": 120.0,
        "torus": 5 * 120.0,          # 5 second-order Newton iterations
    }
    for o in pipeline.optics:
        cname = type(o).__name__.lower()
        if "torus" in cname or "toroidal" in cname:
            flops += SHAPE["torus"]
        elif "cylind" in cname:
            flops += SHAPE["cylinder"]
        elif "mesh" in cname:
            flops += 6 * 2 * 14 * 14  # Newton iters x Chebyshev deg^2 MACs
        elif "spher" in cname:
            flops += SHAPE["sphere"]
        else:
            flops += SHAPE["plane"]
        if "mosaic" in cname:
            depth = int(o.param.get("mosaic_depth", 15))
            flops += depth * 100.0   # per-layer: normals, Bragg, reflect
        elif "crystal" in cname:
            flops += 60.0            # Bragg deviation + rocking curve
        flops += 40.0                # bounds/aperture/frame transforms
    from xicsrt_tpu.sources.plasma import PlasmaGeneric

    flops += SOURCE
    if isinstance(pipeline.source, PlasmaGeneric):
        # Windowed interval-one-hot bundle gather: 8 attrs x rows MACs.
        # Beyond 4096 bundles the kernel reads two chunk-sized pages
        # (2 x 2048 rows) regardless of bundle_count.
        B_pad = _round_up(max(int(pipeline.source.bundle_count), 128), 128)
        flops += 2.0 * 8.0 * min(B_pad, 4096)
    return flops, mpr


def time_chained(step, params, n_rays, reps=2, blocks=2):
    import jax
    import jax.numpy as jnp

    jitted = jax.jit(step)
    key = jax.random.key(0)
    dep = jnp.uint32(0)
    for w in range(2):
        dep = jitted(params, jax.random.fold_in(key, 900 + w), dep)
    jax.block_until_ready(dep)
    best = float("inf")
    for b in range(blocks):
        d = dep
        t0 = time.perf_counter()
        for r in range(reps):
            d = jitted(params, jax.random.fold_in(key, b * reps + r), d)
        jax.block_until_ready(d)
        best = min(best, time.perf_counter() - t0)
    return n_rays * reps / best


def run_scenario(name, log2=None, num_iter=None):
    if log2 is None:
        log2 = int(os.environ.get("XICSRT_BENCH_LOG2", "22"))
    if num_iter is None:
        num_iter = int(os.environ.get("XICSRT_BENCH_ITER", "4"))
    import jax
    import jax.numpy as jnp

    from xicsrt_tpu.engine import Pipeline

    intensity = 1 << log2
    config = SCENARIOS[name](intensity, num_iter)

    if name == "fused_diff":
        from xicsrt_tpu.gradients import make_fused_differentiable

        chunk_env = os.environ.get("XICSRT_BENCH_CHUNK")
        forward, vjp_fn, pack, pipeline = make_fused_differentiable(
            config, num_iter=num_iter,
            chunk=int(chunk_env) if chunk_env else 8192,
        )
        pvec = pipeline and pack(pipeline.params)
        img_keys = {}
        for o in pipeline.optics:
            if o.enable_image:
                nx, ny = (int(v) for v in o.image_shape)
                img_keys[o.name] = jax.random.uniform(
                    jax.random.key(hash(o.name) % 1000), (nx, ny)
                ).astype(jnp.float32)

        @jax.jit
        def step(pvec, key, dep):
            # Real optimization-step shape: forward, loss cotangent from
            # the images (data dependency serializes fwd -> vjp), vjp.
            k = jax.random.fold_in(key, dep)
            out = forward(pvec, k)
            g = {n: out["image"][n] - img_keys[n] for n in out["image"]}
            gv = vjp_fn(pvec, k, g)
            return (jnp.abs(gv[16 + 13]) * 1e3).astype(jnp.uint32)

        n_rays = intensity * num_iter
        rps = time_chained(step, pvec, n_rays)
        return {"scenario": name, "engine": "fused",
                "rays_per_s": float(f"{rps:.4g}"),
                "rays_per_dispatch": n_rays}

    if name == "diff_fwd_bwd":
        from xicsrt_tpu.gradients import make_differentiable

        remat_env = os.environ.get("XICSRT_BENCH_REMAT")
        image_fn, pipeline = make_differentiable(
            config, num_iter=num_iter,
            remat=None if remat_env is None else remat_env == "1",
        )

        # Pixel-weighted loss: a plain sum(image) lets XLA dead-code
        # -eliminate most of the trace (the bilinear splat's in-bounds sum
        # barely depends on positions), inflating the measurement ~100x.
        # Random fixed pixel weights force every per-pixel value (and its
        # adjoint) to be computed — the shape of a real alignment loss.
        nx, ny = pipeline.optics[-1].image_shape
        pixel_w = jax.random.uniform(jax.random.key(42), (int(nx), int(ny)))

        def loss(params, key):
            return jnp.sum(image_fn(params, key)["detector"] * pixel_w)

        grad_fn = jax.grad(loss)

        def step(params, key, dep):
            g = grad_fn(params, jax.random.fold_in(key, dep))
            leaf = g["optics"]["crystal"]["frame"].origin
            return (jnp.abs(leaf[0]) * 1e6).astype(jnp.uint32)

        n_rays = intensity * num_iter
        rps = time_chained(step, pipeline.params, n_rays)
        # Reverse mode with per-iteration remat: ~3 forward-equivalent
        # passes (primal + recompute + adjoint).
        fpr, _ = _flops_per_ray(pipeline, "xla")
        mfu = 3.0 * fpr * rps / PEAK_FLOPS
    else:
        pipeline = Pipeline(config)
        engine = "xla"
        if os.environ.get("XICSRT_BENCH_ENGINE", "auto") != "xla":
            from xicsrt_tpu.ops.fused_trace import (
                FusedUnsupported, build_fast_run,
            )

            chunk_env = os.environ.get("XICSRT_BENCH_CHUNK")
            try:
                fused, engine = build_fast_run(
                    pipeline, num_iter=num_iter,
                    chunk=int(chunk_env) if chunk_env else None,
                )
            except FusedUnsupported:
                pass
        if engine == "fused":
            run = lambda params, key: fused(key)  # noqa: E731
        else:
            run = pipeline.make_run(num_iter, keep_history=False,
                                    keep_images=True)
        last = pipeline.element_names[-1]

        def step(params, key, dep):
            out = run(params, jax.random.fold_in(key, dep))
            return out["meta"][last].astype(jnp.uint32)

        n_rays = pipeline.num_rays * num_iter
        rps = time_chained(step, pipeline.params, n_rays)
        fpr, mpr = _flops_per_ray(pipeline, engine)
        mfu = fpr * rps / PEAK_FLOPS
        return {"scenario": name, "engine": engine,
                "rays_per_s": float(f"{rps:.4g}"),
                "rays_per_dispatch": n_rays,
                "mfu": float(f"{mfu:.3g}"),
                "flops_per_ray": float(f"{fpr:.4g}"),
                "binning_macs_per_ray": int(mpr)}
    return {"scenario": name, "engine": "xla",
            "rays_per_s": float(f"{rps:.4g}"),
            "rays_per_dispatch": n_rays,
            "mfu": float(f"{mfu:.3g}"),
            "flops_per_ray": float(f"{fpr:.4g}")}


def main():
    names = sys.argv[1:] or list(SCENARIOS)
    for name in names:
        try:
            res = run_scenario(name)
        except Exception as err:
            res = {"scenario": name, "error": f"{type(err).__name__}: {err}"}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
