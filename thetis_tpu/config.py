"""Global configuration for thetis_tpu.

Precision policy: all host-side mesh/tabulation preprocessing is done in
float64 numpy.  Device arrays are created with ``jnp.asarray`` so they follow
the JAX x64 setting: with ``jax_enable_x64`` (recommended for CPU test runs)
everything is float64; without it (TPU production) arrays are float32.

Reference parity: physical constants mirror
``thetis/physical_constants.py:6-14`` in the reference implementation.
"""
import jax.numpy as jnp

__all__ = ["physical_constants", "float_dtype", "int_dtype"]

#: Physical constants (mutable at runtime, like the reference's Constant dict).
physical_constants = {
    "g_grav": 9.81,
    "rho0": 1000.0,
    "von_karman": 0.4,
    "rho_air": 1.22,
}


def float_dtype():
    """Return the active floating point dtype (f64 iff jax x64 is enabled)."""
    return jnp.asarray(0.0).dtype


def int_dtype():
    return jnp.asarray(0).dtype
