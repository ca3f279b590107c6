from .reduced_functional import (
    Control,
    ReducedFunctional,
    taylor_test,
    minimize,
)

__all__ = ["Control", "ReducedFunctional", "taylor_test", "minimize"]
