"""Position-based filters applied to ray or bundle origins.

Equivalent of ``xicsrt/filters/_XicsrtBundleFilter*.py``. A filter compiles
to a pure function ``(params, origin, mask) -> mask`` usable both on plasma
bundle centers and on generated rays (the reference applies the same objects
to both, ``_XicsrtPlasmaGeneric.bundle_filter`` and
``_XicsrtSourceGeneric.ray_filter``).
"""

from __future__ import annotations

import jax.numpy as jnp

from xicsrt_tpu.dispatch import GeometryElement, register
from xicsrt_tpu.ops import vector as vec


@register("XicsrtBundleFilter", "filter_none")
class FilterBase(GeometryElement):
    """Base filter: passes everything through."""

    def make_filter(self):
        def apply(params, origin, mask):
            return mask

        return apply


@register("XicsrtBundleFilterSightline", "filter_sightline")
class FilterSightline(FilterBase):
    """Keep origins within ``radius`` of a cylinder along the filter z-axis.

    Geometry per ``_XicsrtBundleFilterSightline.py:31-56``.
    """

    def default_config(self) -> dict:
        config = super().default_config()
        config["radius"] = None
        return config

    def check_param(self):
        super().check_param()
        if self.param["radius"] is None:
            raise ValueError(f'Filter "{self.name}": radius is required.')

    def build_params(self) -> dict:
        params = super().build_params()
        params["radius"] = self.as_array(self.param["radius"])
        return params

    def make_filter(self):
        def apply(params, origin, mask):
            frame = params["frame"]
            l0 = frame.origin[None, :] - origin
            proj = vec.dot(l0, frame.zaxis)
            perp = l0 - proj[:, None] * frame.zaxis[None, :]
            dist = vec.magnitude(perp)
            return mask & (dist <= params["radius"])

        return apply
