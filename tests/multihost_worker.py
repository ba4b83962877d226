"""Worker process for the 2-process ``jax.distributed`` test.

Launched by ``tests/test_multihost.py`` (two copies over localhost). Each
process owns 4 virtual CPU devices; the sharded engine runs over the 8
GLOBAL devices, psum-reducing images/meta across processes (Gloo
collectives) — the in-program replacement for the reference's slurm-array +
offline-merge recipe (``doc_source/userguide/multiple_processors.rst:27-78``).

Usage: python multihost_worker.py <process_id> <port> <out_npz> <config_json>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/xicsrt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]
    config = json.loads(sys.argv[4])

    import numpy as np

    from xicsrt_tpu import engine
    from xicsrt_tpu.parallel import init_multihost

    info = init_multihost(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert info["process_count"] == 2, info
    assert info["num_devices"] == 8, info
    assert info["is_primary"] == (pid == 0), info

    result = engine.raytrace_single(config)

    found = result["found"]["history"]
    has_history = "detector" in found
    np.savez(
        out_path,
        image=result["total"]["image"]["detector"],
        num_source=result["total"]["meta"]["source"]["num_out"],
        num_detector=result["total"]["meta"]["detector"]["num_out"],
        found_local=(found["detector"]["origin"].shape[0]
                     if has_history else -1),
        found_final_mask_all=(np.all(found["detector"]["mask"])
                              if has_history else True),
    )
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
