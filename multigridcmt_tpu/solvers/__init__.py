from . import cycles, eigen  # noqa: F401
from .cycles import coarse_solve, fmg, solve, v_cycle  # noqa: F401
from .eigen import eigensolve  # noqa: F401
