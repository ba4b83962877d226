"""Measured roofline for the VPU-bound scenario rows (round-4 verdict #6).

The flagship's mfu is backed by exact binning-MAC counts; the
toroidal/mosaic/plasma rows used to rest on prose estimates. This tool
replaces them with:

1. **Derived per-ray op counts** — the ACTUAL kernel code
   (``fused_trace._trace_chain`` + the pure source samplers) is traced
   to a jaxpr and its primitives are censused per class
   (MXU MACs from dot_general shapes; transcendental / sqrt-div /
   simple VPU elementwise ops by output element count).
2. **On-chip VPU/MXU microbenches** — per-class rates measured with the
   serialized-dependency harness (bench.py rules).
3. **Roofline prediction vs measurement** — serial bound
   (sum of class times) and perfect-overlap bound (max class time)
   per ray; the measured throughput should land below the overlap
   bound and near the serial bound for compute-bound rows.

Writes ROOFLINE.json and prints one table. Usage:
    PYTHONPATH=. timeout 590 python tools/roofline.py [scenario ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRANS = {
    "exp", "log", "log1p", "expm1", "sin", "cos", "tan", "asin", "acos",
    "atan", "atan2", "sinh", "cosh", "tanh", "erf", "erf_inv", "erfc",
    "pow", "cbrt", "logistic",
}
SQRTDIV = {"sqrt", "rsqrt", "div", "rem"}
FREE = {
    "broadcast_in_dim", "reshape", "transpose", "squeeze", "slice",
    "iota", "stop_gradient", "copy", "bitcast_convert_type",
}


def _aval_size(aval):
    n = 1
    for d in getattr(aval, "shape", ()):
        n *= int(d)
    return n


def count_ops(fn, *args):
    """Census the jaxpr of ``fn(*args)`` into per-class op counts."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = {"mxu_macs": 0.0, "trans": 0.0, "sqrtdiv": 0.0, "simple": 0.0}

    def visit(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            # Recurse into call-like primitives.
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):  # ClosedJaxpr
                    visit(p.jaxpr)
                elif hasattr(p, "eqns"):  # raw Jaxpr
                    visit(p)
            if name == "dot_general":
                dn = eqn.params["dimension_numbers"]
                (lc, _rc), (lb, _rb) = dn
                lhs = eqn.invars[0].aval
                k = 1
                for d in lc:
                    k *= int(lhs.shape[d])
                out = _aval_size(eqn.outvars[0].aval)
                counts["mxu_macs"] += out * k
            elif name in FREE or hasattr(
                    next(iter(eqn.params.values()), None), "jaxpr"):
                continue
            elif name in TRANS:
                counts["trans"] += _aval_size(eqn.outvars[0].aval)
            elif name in SQRTDIV:
                counts["sqrtdiv"] += _aval_size(eqn.outvars[0].aval)
            elif name == "integer_pow":
                counts["simple"] += 2 * _aval_size(eqn.outvars[0].aval)
            elif eqn.outvars and getattr(eqn.outvars[0].aval, "shape",
                                         None) is not None:
                counts["simple"] += _aval_size(eqn.outvars[0].aval)

    visit(jaxpr.jaxpr)
    return counts


class _FakeRef:
    """Stands in for a Pallas VMEM ref when tracing the chain body."""

    def __init__(self, val):
        self.val = val

    def __getitem__(self, idx):
        return self.val

    def __setitem__(self, idx, v):
        self.val = v


def chain_ops_per_ray(config, chunk=8192):
    """Derived per-ray op counts of the fused kernel body for a config:
    the REAL ``_trace_chain`` (optics, bounds, apertures, interactions,
    MXU binning) plus the pure source-sampling replica, traced to jaxpr.
    """
    import jax
    import jax.numpy as jnp

    from xicsrt_tpu.engine import Pipeline
    from xicsrt_tpu.ops import fused_grad as FG
    from xicsrt_tpu.ops import fused_trace as FT
    from xicsrt_tpu.sources.plasma import PlasmaGeneric

    pipeline = Pipeline(config)
    g = pipeline.general
    mode = str(g.get("interact_mode", "mc")).lower()
    wavelength = float(pipeline.source.param["wavelength"])
    per_ray_wl = str(
        pipeline.source.param.get("wavelength_dist", "monochrome")
    ).lower() != "monochrome" or isinstance(pipeline.source, PlasmaGeneric)
    optics = [FT._optic_spec(o, wavelength, per_ray_wl, mode)
              for o in pipeline.optics]
    tables = FT._collect_tables(optics)
    sub = chunk // 8
    n_draws_optics = sum(o.get("n_draws", 0) for o in optics)

    def chain_fn(px, py, pz, dx, dy, dz, wl, uniforms):
        slot = [0]

        def draw():
            k = slot[0]
            slot[0] += 1
            return uniforms[k]

        counts_acc = [jnp.zeros((8, 128), jnp.int32)]

        def count_into(elem, alive):
            c = jnp.sum(alive.astype(jnp.int32))
            crow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            ccol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            counts_acc[0] = counts_acc[0] + c * (
                (crow == 0) & (ccol == elem)).astype(jnp.int32)

        image_refs = [
            _FakeRef(jnp.zeros(FT._image_acc_shape(o["image"], "nearest"),
                               jnp.float32))
            for o in optics if o["image"]
        ]
        table_refs = [_FakeRef(jnp.asarray(t)) for t in tables]
        alive = px < 1e30
        FT._trace_chain(optics, sub, True, True, draw, count_into,
                        image_refs, table_refs, px, py, pz, dx, dy, dz,
                        wl, alive, wt=None, mode=mode,
                        image_mode="nearest")
        return (counts_acc[0], *[r.val for r in image_refs])

    f32 = np.float32
    arr = jnp.zeros((8, sub), f32)
    uniforms = jnp.zeros((max(n_draws_optics, 1), 8, sub), f32)
    chain = count_ops(chain_fn, arr, arr, arr + 1.0, arr, arr,
                      arr + 1.0, arr + 3.9, uniforms)

    # Source stage: the pure replicas (fused_grad samplers reproduce the
    # megakernel's formulas for their subsets).
    src_counts = {k: 0.0 for k in chain}
    if isinstance(pipeline.source, PlasmaGeneric):
        p = dict(pipeline.source.param)
        if p.get("spread") is not None and not list(p.get("filters") or []):
            import math

            spec = {
                "kind": "plasma",
                "origin": (0.0, 0.0, 0.0),
                "basis": ((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0)),
                "sizes": tuple(float(p[k]) for k in
                               ("xsize", "ysize", "zsize")),
                "voxel": float(pipeline.source.voxel_size),
                "target": (0.0, 0.0, 1.0),
                "cos_spread": math.cos(float(p["spread"])),
                "wavelength": wavelength,
                "sigma_conv": 1e-4,
                "gamma": float(pipeline.source.gamma),
                "velocity": None,
                "E0": 1.0, "T0": 1.0, "w0_base": 1.0,
            }
            nd = (sum(1 for s in spec["sizes"] if s)
                  + (3 if spec["voxel"] > 0 else 0) + 3
                  + (1 if spec["gamma"] > 0 else 0))
            P = jnp.zeros((32,), f32)

            def src_fn(uniforms):
                slot = [0]

                def draw():
                    k = slot[0]
                    slot[0] += 1
                    return uniforms[k]

                out = FG._sample_plasma(spec, draw, sub, P, 24)
                return out[:8]

            src_counts = count_ops(src_fn, jnp.zeros((nd, 8, sub), f32))
            # Windowed interval-one-hot bundle gather: 8 attribute rows x
            # window rows of MACs per ray (window = min(B_pad, 2 pages)).
            B_pad = -(-max(int(pipeline.source.bundle_count), 128)
                      // 128) * 128
            src_counts["mxu_macs"] += 8.0 * min(B_pad, 4096) * chunk
            # Interval one-hot construction: 2 compares + 1 and per row.
            src_counts["simple"] += 3.0 * min(B_pad, 4096) * chunk
    else:
        src_spec = FT._source_spec(pipeline.source, {})
        try:
            gspec = FG._grad_source_spec(pipeline.source)

            def src_fn(uniforms):
                slot = [0]

                def draw():
                    k = slot[0]
                    slot[0] += 1
                    return uniforms[k]

                return FG._sample_source(gspec, draw, sub)

            nd = max(gspec["n_draws"], 1)
            src_counts = count_ops(src_fn, jnp.zeros((nd, 8, sub), f32))
        except Exception:
            # Outside the replica subset: transcript-level estimate from
            # the draw count (2 trig + norm per draw pair).
            src_counts["trans"] = 3.0 * src_spec["n_draws"] * chunk
            src_counts["simple"] = 20.0 * src_spec["n_draws"] * chunk

    total = {k: (chain[k] + src_counts[k]) / chunk for k in chain}
    return total, pipeline


def microbench_rates():
    """Per-class element rates measured INSIDE Pallas kernels — the same
    codegen (Mosaic) the fused engine runs under, so the roofline
    compares like with like.

    Measurement rules learned the hard way on this backend (all
    violations produced rates 20-400x the chip peak):

    - NO large input buffers: the tunneled backend may re-ship them per
      call (N=2^27 input reads as ~300 ms of tunnel time) or hit a
      server-side replay cache (identical-input dispatches return in
      0.07 ms with correct values). All data is generated IN-KERNEL
      from the grid index + a scalar seed, like the fused engine.
    - Dispatches chain through a scalar data dependency (bench.py) and
      each dispatch carries ~seconds of work.
    - Unrolled loops need value feedback or Mosaic hoists the
      loop-invariant body (a static matmul loop read 25x peak).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sub = 1024
    f32 = jnp.float32

    def timed(jitted, work_per_dispatch):
        # NEVER restart the dep chain: re-running a previously-seen
        # (executable, input) pair hits a server-side replay cache and
        # returns in ~40 us regardless of work. Chain continuously so
        # every dispatch has a fresh input value.
        # ... and block_until_ready itself can report early on this
        # backend: end every timed block with a HOST FETCH of the scalar
        # (4 bytes; the data cannot be fetched before it exists).
        dep = jnp.float32(0.5)
        for _ in range(2):
            dep = jitted(dep)
        np.asarray(dep).item()
        reps, best = 3, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                dep = jitted(dep)
            np.asarray(dep).item()
            best = min(best, time.perf_counter() - t0)
        return reps * work_per_dispatch / best

    def elem_rate(body, ops_per_elem, n_chunks, K=128, streams=4):
        # `streams` independent chains interleave so the measurement is
        # not bound by the latency of one serial dependency chain — the
        # real kernels have the same ILP structure (many independent
        # per-ray value streams in flight).
        def kernel(seed_ref, o_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                o_ref[...] = jnp.zeros((8, 128), f32)

            base = (jax.lax.broadcasted_iota(jnp.int32, (8, sub), 1)
                    + i * 7919)
            ys = [base.astype(f32) * 1e-6 + seed_ref[0] * (1.0 + 0.1 * s)
                  for s in range(streams)]
            for _ in range(K):
                ys = [body(y) for y in ys]
            # ACCUMULATE into the (revisited) output block: an overwrite
            # would let the compiler elide all but the last grid step.
            tot = ys[0]
            for y in ys[1:]:
                tot = tot + y
            o_ref[...] += jnp.sum(tot, axis=1, keepdims=True) * jnp.ones(
                (8, 128), f32)

        call = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), f32),
        )
        # O(1) chaotic feedback: a tiny scaling would round away in f32
        # and leave every dispatch's input bit-identical (replay cache).
        jitted = jax.jit(lambda dep: jnp.sin(jnp.sum(
            call(jnp.stack([0.5 + 0.125 * dep]))) * 1e-9))
        return timed(jitted,
                     n_chunks * 8 * sub * K * ops_per_elem * streams)

    r_trans = elem_rate(lambda y: jnp.exp(y * -0.9), 1, n_chunks=512)
    r_sqrt = elem_rate(lambda y: jax.lax.rsqrt(jnp.abs(y) + 1.0), 1,
                       n_chunks=512)
    # 4 elementary ops per body call (compare, select, mul, add).
    r_simple = elem_rate(
        lambda y: jnp.where(y > 0.1, y * 0.9999 + 1e-6, y + 1e-3), 4,
        n_chunks=4096, streams=8)

    # In-kernel MXU MAC rate, binning-shaped bf16 contraction
    # (rows-on-sublanes x rays-on-lanes) with value feedback.
    K_mm = 64
    R = 128
    n_mm = 8192

    def mm_kernel(seed_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            o_ref[...] = jnp.zeros((R, 128), f32)

        a = (jax.lax.broadcasted_iota(jnp.int32, (R, sub), 1)
             + i).astype(f32) * 1e-6 + seed_ref[0]
        b = jax.lax.broadcasted_iota(
            jnp.int32, (128, sub), 0).astype(f32) * 1e-4
        a = a.astype(jnp.bfloat16)
        bb = b.astype(jnp.bfloat16)
        acc = jnp.zeros((R, 128), f32)
        for _ in range(K_mm):
            acc += jax.lax.dot_general(
                a, bb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            a = (a.astype(f32) * (1.0 + acc[0, 0] * 1e-20)).astype(
                jnp.bfloat16)
        o_ref[...] += acc

    mm_call = pl.pallas_call(
        mm_kernel,
        grid=(n_mm,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), f32),
    )
    mm_jit = jax.jit(lambda dep: jnp.sin(jnp.sum(
        mm_call(jnp.stack([0.01 + 0.002 * dep]))) * 1e-9))
    r_mxu = timed(mm_jit, n_mm * K_mm * (R * 128 * sub))

    return {"trans_per_s": r_trans, "sqrtdiv_per_s": r_sqrt,
            "simple_per_s": r_simple, "mxu_macs_per_s": r_mxu}


SCENARIO_NAMES = ["toroidal", "mosaic15", "plasma_torus", "flagship"]


def main():
    from tools import bench_scenarios as BS

    names = sys.argv[1:] or SCENARIO_NAMES
    rates = microbench_rates()
    print("chip rates:", {k: f"{v:.3e}" for k, v in rates.items()})

    out = {"rates": rates, "scenarios": {}}
    for name in names:
        if name == "flagship":
            from __graft_entry__ import _spectrometer_config

            config = _spectrometer_config(intensity=1 << 27, num_iter=1,
                                          keep_images=True)
            measured = None
            chunk = 131072
        else:
            config = BS.SCENARIOS[name](1 << 22, 4)
            measured = None
            chunk = 8192
        counts, _pipe = chain_ops_per_ray(config, chunk=chunk)
        t_classes = {
            "mxu": counts["mxu_macs"] / rates["mxu_macs_per_s"],
            "trans": counts["trans"] / rates["trans_per_s"],
            "sqrtdiv": counts["sqrtdiv"] / rates["sqrtdiv_per_s"],
            "simple": counts["simple"] / rates["simple_per_s"],
        }
        pred_serial = 1.0 / sum(t_classes.values())
        pred_overlap = 1.0 / max(t_classes.values())
        # Measure on-chip via the scenario harness.
        try:
            if name == "flagship":
                os.environ["XICSRT_BENCH_CHUNK"] = str(chunk)
                from xicsrt_tpu.engine import Pipeline
                from xicsrt_tpu.ops.fused_trace import build_fused_run

                import jax
                import jax.numpy as jnp

                pipeline = Pipeline(config)
                fused = build_fused_run(pipeline, num_iter=1, chunk=chunk)

                def step(params, key, dep):
                    o = fused(jax.random.fold_in(key, dep))
                    return o["meta"]["detector"].astype(jnp.uint32)

                measured = BS.time_chained(step, pipeline.params,
                                           1 << 27)
            else:
                res = BS.run_scenario(name)
                measured = res["rays_per_s"]
        except Exception as err:  # pragma: no cover
            print(f"{name}: measurement failed ({err})")
        row = {
            "ops_per_ray": {k: round(v, 1) for k, v in counts.items()},
            "class_time_share": {
                k: round(v * pred_serial, 3) for k, v in t_classes.items()
            },
            "predicted_serial_rays_per_s": float(f"{pred_serial:.4g}"),
            "predicted_overlap_rays_per_s": float(f"{pred_overlap:.4g}"),
            "measured_rays_per_s": (measured and float(f"{measured:.4g}")),
            # >1 means the kernel beats the serial-chain microbench model
            # (packed bf16 compares + MXU/VPU co-issue the model cannot
            # see); the CLASS SHARES are the load-bearing output.
            "measured_vs_serial_bound": (
                measured and float(f"{measured / pred_serial:.3g}")),
            "measured_vs_overlap_bound": (
                measured and float(f"{measured / pred_overlap:.3g}")),
        }
        out["scenarios"][name] = row
        print(name, json.dumps(row))

    with open("ROOFLINE.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote ROOFLINE.json")


if __name__ == "__main__":
    main()
