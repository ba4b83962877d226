"""Bundle/ray filters."""

from xicsrt_tpu.filters.sightline import FilterSightline  # noqa: F401
