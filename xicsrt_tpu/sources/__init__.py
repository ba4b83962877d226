"""Ray sources: generic/directed/focused emitters and plasma bundles."""

from xicsrt_tpu.sources.generic import (  # noqa: F401
    SourceDirected,
    SourceFocused,
    SourceGeneric,
)
from xicsrt_tpu.sources.plasma import (  # noqa: F401
    PlasmaCubic,
    PlasmaCylindrical,
    PlasmaGeneric,
    PlasmaToroidal,
    PlasmaToroidalDatafile,
)
