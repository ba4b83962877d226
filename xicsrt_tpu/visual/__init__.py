"""Visualization: 2D intersection/image plots and 3D scene rendering."""

from xicsrt_tpu.visual import detview, plot2d, plot3d  # noqa: F401
