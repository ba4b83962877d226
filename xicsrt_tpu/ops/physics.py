"""X-ray physics conversions (energy <-> wavelength, Bragg angle).

Equivalent of ``xicsrt/tools/xicsrt_physics.py`` and the ``bragg_angle``
helper in ``xicsrt/tools/xicsrt_math.py:156-166``.
"""

from __future__ import annotations

import jax.numpy as jnp

# h * c / e in [eV * Angstrom] (CODATA 2018 exact constants).
HC_EV_ANGSTROM = 6.62607015e-34 * 299792458.0 / 1.602176634e-19 * 1e10


def wavelength_from_energy(energy_ev):
    """Photon wavelength [Angstrom] from energy [eV]."""
    return HC_EV_ANGSTROM / energy_ev


def energy_from_wavelength(wavelength_angstrom):
    """Photon energy [eV] from wavelength [Angstrom]."""
    return HC_EV_ANGSTROM / wavelength_angstrom


def bragg_angle(wavelength, crystal_spacing, order: int = 1):
    """Bragg angle [rad]: arcsin(m * lambda / (2 d)).

    ``crystal_spacing`` is the nominal 'd' spacing (not '2d'), matching the
    reference convention (``_InteractCrystal.py:24-33``).
    """
    ratio = order * wavelength / (2.0 * crystal_spacing)
    return jnp.arcsin(jnp.clip(ratio, -1.0, 1.0))
