"""xicsrt_tpu: a TPU-native, differentiable Monte-Carlo x-ray raytracing
framework (JAX/XLA/Pallas).

Provides the capabilities of PrincetonUniversity/xicsrt — photon-accurate
plasma sources, Bragg-crystal optics, aperture/filter chains, detector
images — redesigned TPU-first: rays are fixed-shape sharded arrays, the optic
chain compiles to one fused XLA program, randomness is stateless key folding,
and multi-chip scaling uses `jax.sharding` collectives instead of
multiprocessing.
"""

from xicsrt_tpu._version import __version__  # noqa: F401

import os as _os

import jax as _jax

# Persistent XLA compilation cache: identical pipelines across processes skip
# compilation entirely. Backends with remote compile services have high and
# variable per-compile latency, so this matters even for small programs.
if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/xicsrt_tpu/jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

# Importing the element packages populates the class registry.
import xicsrt_tpu.filters  # noqa: E402,F401
import xicsrt_tpu.optics  # noqa: E402,F401
import xicsrt_tpu.sources  # noqa: E402,F401
from xicsrt_tpu.engine import combine_raytrace, raytrace, raytrace_single  # noqa: F401
from xicsrt_tpu.gradients import (  # noqa: F401
    align,
    make_differentiable,
    make_fused_differentiable,
)
from xicsrt_tpu.public import get_element  # noqa: F401
from xicsrt_tpu.utils.version import warn_version  # noqa: F401

# The reference exposes a separate multiprocessing entry point
# (``xicsrt.raytrace_mp(config, processes=None)``,
# ``xicsrt_multiprocessing.py:12``). Here one entry point covers 1..N chips:
# ``processes`` maps to the device count of the ray-sharded mesh.
def raytrace_mp(config, processes=None):
    """Drop-in equivalent of the reference's multiprocess raytrace.

    Runs the ray-sharded engine over ``processes`` devices (default: all).
    With one device this is identical to :func:`raytrace`.
    """
    import copy

    n = processes if processes is not None else len(_jax.devices())
    n = min(int(n), len(_jax.devices()))
    if n > 1:
        config = copy.deepcopy(config)
        general = config.setdefault("general", {})
        general["shard_rays"] = True
        general["devices"] = n
    return raytrace(config)
