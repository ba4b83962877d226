"""Optics: shapes x interactions, compiled to pure trace functions."""

from xicsrt_tpu.optics import composites  # noqa: F401  (registers classes)
from xicsrt_tpu.optics.base import TraceElement  # noqa: F401
from xicsrt_tpu.optics.interactions import (  # noqa: F401
    InteractCrystal,
    InteractMirror,
    InteractMosaicCrystal,
    InteractNone,
)
from xicsrt_tpu.optics.shapes import (  # noqa: F401
    ShapeCylinder,
    ShapePlane,
    ShapeSphere,
    ShapeTorus,
)
