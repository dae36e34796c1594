from .mesh import make_mesh, state_sharding, rows_spec
from .stepper import build_step_fn, build_poisson_fn

__all__ = [
    "make_mesh",
    "state_sharding",
    "rows_spec",
    "build_step_fn",
    "build_poisson_fn",
]
