"""``from thetis_tpu import *`` — the thetis-style user namespace.

Mirrors what ``from thetis import *`` provides to reference user scripts
(meshes, FunctionSpace/Function, Constant, solver objects, math functions
used in expressions), so the reference demos translate almost verbatim:
UFL expressions become jnp expressions over dof-coordinate arrays.
"""
import numpy as _np
import jax.numpy as jnp

from .config import physical_constants
from .mesh.mesh2d import Mesh2d
from .mesh.generation import (RectangleMesh, UnitSquareMesh, SquareMesh,
                              PeriodicRectangleMesh)
from .fem.functionspace import (
    FunctionSpace,
    VectorFunctionSpace,
    Function,
    SpatialCoordinate,
    get_functionspace,
)
from .fem.assembly import DGAssembler
from .utils.constant import Constant
from .utils.log import print_output, set_log_directory
from .model.options import ModelOptions2d, TracerFieldOptions
from .model.field_defs import field_metadata, FieldDict, AttrDict
from .model import flowsolver2d as solver2d
from .model.flowsolver2d import FlowSolver2d
from .model import callback
from .model.callback import (
    DiagnosticCallback,
    DetectorsCallback,
    TimeSeriesCallback2D,
    TimeSeriesCallback3D,
)
from .equations.limiter import VertexBasedP1DGLimiter

# math vocabulary for user expressions (UFL-operator lookalikes over arrays)
exp = jnp.exp
sqrt = jnp.sqrt
sin = jnp.sin
cos = jnp.cos
tan = jnp.tan
sinh = jnp.sinh
cosh = jnp.cosh
tanh = jnp.tanh
ln = jnp.log
pi = _np.pi
abs = jnp.abs  # noqa: A001 - mirrors ufl.abs in user scripts


def conditional(cond, true_val, false_val):
    return jnp.where(cond, true_val, false_val)


def min_value(a, b):
    return jnp.minimum(a, b)


def max_value(a, b):
    return jnp.maximum(a, b)


def dot(a, b):
    return (jnp.asarray(a) * jnp.asarray(b)).sum(-1)


def as_vector(components):
    return jnp.stack([jnp.broadcast_to(jnp.asarray(c), jnp.broadcast_shapes(
        *[jnp.shape(x) for x in components])) for c in components], axis=-1)


__all__ = [  # noqa: F822
    "physical_constants", "Mesh2d", "RectangleMesh", "UnitSquareMesh",
    "PeriodicRectangleMesh",
    "SquareMesh", "FunctionSpace", "VectorFunctionSpace", "Function",
    "SpatialCoordinate", "get_functionspace", "DGAssembler", "Constant",
    "print_output", "set_log_directory", "ModelOptions2d",
    "TracerFieldOptions", "field_metadata", "FieldDict", "AttrDict",
    "solver2d", "FlowSolver2d", "callback", "DiagnosticCallback",
    "DetectorsCallback", "TimeSeriesCallback2D", "TimeSeriesCallback3D",
    "VertexBasedP1DGLimiter",
    "exp", "sqrt", "sin", "cos", "tan", "sinh", "cosh", "tanh", "ln", "pi",
    "conditional", "min_value", "max_value", "dot", "as_vector",
]
