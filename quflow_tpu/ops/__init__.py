from .geometry import (
    hbar,
    bracket,
    norm_L2,
    inner_L2,
    norm_Linf,
    norm_L1,
    integral,
    so3_generators,
    rotate,
    cartesian_generators,
    grad,
    project_skewherm,
)
from .diagpack import mat2diagh, diagh2mat, pack_indices, num_rows
from . import laplacian
from .laplacian import (
    laplace,
    solve_poisson,
    solve_heat,
    solve_helmholtz,
    solve_viscdamp,
    solve_globalqg,
)
