"""Interactive element access (equivalent of ``xicsrt/xicsrt_public.py``)."""

from __future__ import annotations

from xicsrt_tpu import dispatch
from xicsrt_tpu.config import get_config


def get_element(config: dict, name: str):
    """Build one fully-initialized element outside a raytrace.

    Searches the optics/sources/filters sections for ``name`` (cf.
    ``xicsrt_public.get_element`` :13-46). Used by the visualization layer
    for coordinate transforms.
    """
    config = get_config(config)
    for section in ("optics", "sources", "filters"):
        if name in config.get(section, {}):
            return dispatch.instantiate(
                name, config[section][name], config["general"]
            )
    raise KeyError(f'Element "{name}" not found in config.')
