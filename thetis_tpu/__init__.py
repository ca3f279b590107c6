"""thetis_tpu: a TPU-native (JAX/XLA/Pallas) coastal ocean model.

A from-scratch reimplementation of the capabilities of the Thetis coastal
ocean model (thetisproject/thetis) designed for TPU hardware: matrix-free DG
residual evaluation over static unstructured-mesh tables, jitted lax.scan
time loops, matrix-free Newton-Krylov implicit solves, shard_map mesh
partitioning with halo exchange over ICI, and jax.grad adjoints.

``from thetis_tpu import *`` provides the thetis-style user namespace (see
``api.py``) so reference demo scripts translate almost verbatim.
"""
from .api import *  # noqa: F401,F403
from .api import __all__  # noqa: F401

__version__ = "0.1.0"
