"""thetis_tpu: a TPU-native (JAX/XLA/Pallas) coastal ocean model.

A from-scratch reimplementation of the capabilities of the Thetis coastal
ocean model (thetisproject/thetis) designed for TPU hardware: matrix-free DG
residual evaluation over static unstructured-mesh tables, jitted lax.scan
time loops, matrix-free Newton-Krylov implicit solves, shard_map mesh
partitioning with halo exchange over ICI, and jax.grad adjoints.
"""
from .config import physical_constants, float_dtype
from .mesh.mesh2d import Mesh2d
from .mesh.generation import RectangleMesh, UnitSquareMesh, SquareMesh
from .fem.functionspace import (
    FunctionSpace,
    VectorFunctionSpace,
    Function,
    SpatialCoordinate,
    get_functionspace,
)
from .fem.assembly import DGAssembler

__version__ = "0.1.0"
