"""Stateless math/physics kernels (the L0 layer of SURVEY.md)."""

from xicsrt_tpu.ops import (  # noqa: F401
    aperture,
    binning,
    physics,
    polynomials,
    spread,
    vector,
    voigt,
)
