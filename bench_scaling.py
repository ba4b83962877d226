"""Multi-device scaling benchmark: throughput of the ray-sharded engine
over 1..N devices, and the 1->N scaling efficiency.

On real multi-chip TPU hardware this measures ICI scaling of the psum-
reduced spectrometer run (BASELINE.md: ">=90% 1->N scaling efficiency").
With a single real chip it falls back to an 8-device virtual CPU mesh,
which validates the sharded code path and the harness itself (CPU "device"
throughput shares host cores, so CPU efficiency numbers are indicative
only — the JSON reports which backend was measured).

Prints ONE JSON line. Usage: timeout 590 python bench_scaling.py [log2_rays]
"""

import json
import sys
import time

import numpy as np


def _default_device_count() -> int:
    """Count the default backend's devices WITHOUT initializing it here
    (jax_num_cpu_devices cannot be changed after backend init)."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "-c", "import jax; print(len(jax.devices()))"],
        capture_output=True, text=True, timeout=300,
    )
    try:
        return int(proc.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return 1


def main():
    import jax

    if _default_device_count() < 2:
        # Single real chip: validate scaling on the virtual CPU mesh.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    from __graft_entry__ import _spectrometer_config
    from xicsrt_tpu.parallel import make_sharded_run, scaling_efficiency

    backend = jax.default_backend()
    n_total = len(jax.devices())
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else (22 if backend != "cpu" else 19)
    rays = 1 << log2

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    throughputs = {}
    for ndev in sizes:
        config = _spectrometer_config(intensity=rays, num_iter=1)
        fn, pipeline, mesh = make_sharded_run(config, n_devices=ndev)

        def step(params, key, dep):
            out = fn(params, jax.random.fold_in(key, dep))
            return out["meta"]["detector"].astype(jnp.uint32)

        key = jax.random.key(0)
        dep = jnp.uint32(0)
        for w in range(2):
            dep = step(pipeline.params, jax.random.fold_in(key, 100 + w), dep)
        jax.block_until_ready(dep)
        reps = 3
        best = float("inf")
        for block in range(2):
            d = dep
            t0 = time.perf_counter()
            for r in range(reps):
                d = step(pipeline.params, jax.random.fold_in(key, block * reps + r), d)
            jax.block_until_ready(d)
            best = min(best, time.perf_counter() - t0)
        # Sharded intensity preserves the total (rays // ndev per device).
        total = (rays // ndev) * ndev * reps
        throughputs[ndev] = total / best

    eff = scaling_efficiency(throughputs)
    n_max = max(sizes)
    result = {
        "metric": f"scaling_efficiency_1_to_{n_max}",
        "value": float(f"{eff[n_max]:.4g}"),
        "unit": "fraction",
        "backend": backend,
        "throughputs_rays_per_s": {
            str(k): float(f"{v:.4g}") for k, v in throughputs.items()
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
