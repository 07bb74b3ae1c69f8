from . import scan_solver, pallas_solver, solve  # noqa: F401
from .solve import solve as solve_goursat, solve_with_grid  # noqa: F401
