"""Ray sources: generic/directed/focused emitters and plasma bundles."""

from xicsrt_tpu.sources.generic import (  # noqa: F401
    SourceDirected,
    SourceFocused,
    SourceGeneric,
)
