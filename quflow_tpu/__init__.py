"""quflow_tpu: a TPU-native framework for quantized vorticity flows.

Zeitlin's matrix quantization of 2-D incompressible hydrodynamics on the
sphere, built from scratch on JAX/XLA/Pallas for TPU meshes, with the full
capability surface of the reference package klasmodin/quflow (basis
construction, SH<->matrix transforms, five-in-one Poisson solver family,
isospectral/explicit/magnetic integrators, HDF5 simulation + restart,
spectral analysis, plotting, cluster launching) re-architected TPU-first.

Import layout mirrors the reference's flat ``quflow`` namespace so that a
quflow user can switch by changing the import.
"""

from . import config  # noqa: F401  (enables x64; must come first)

from .utils import (
    elm2ind,
    ind2elm,
    complex_dtype,
    real_dtype,
    berezin_multipliers,
    cart2sph,
    sph2cart,
    sphgrid,
    qtime2seconds,
    seconds2qtime,
    poisson_finite_differences,
    run_cluster,
)
from .ops import geometry
from .ops.geometry import (
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
)
# the compat subpackage re-exports the unified backend AND the reference's
# per-backend module paths; binding it here keeps qf.laplacian stable no
# matter what gets imported first (a bare `from .ops import laplacian`
# would be silently rebound by any `import quflow_tpu.laplacian`)
from . import laplacian
from .ops.laplacian import (
    laplace,
    solve_poisson,
    solve_heat,
    solve_helmholtz,
    solve_viscdamp,
    solve_globalqg,
)
from .quantization import (
    basis_break_index,
    compute_basis,
    get_basis,
    shr2mat,
    mat2shr,
    shc2mat,
    mat2shc,
    shr2mat_,
    mat2shr_,
    shc2mat_,
    mat2shc_,
    elmr2mat,
    elmc2mat,
)
from .quantization import (
    adjust_basis_orientation_,
    shr2mat_serial_,
    shr2mat_parallel_,
    mat2shr_serial_,
    mat2shr_parallel_,
)
from .laplacian.direct import compute_direct_laplacian
from . import transforms
from .transforms import (
    fun2shc,
    shc2fun,
    fun2shr,
    shr2fun,
    shc2shr,
    shr2shc,
    fun2img,
    img2fun,
    as_fun,
    as_shr,
    forward,
    inverse,
    mw2gl,
    gl2mw,
)
from . import integrators
from .integrators import (
    isomp,
    isomp_fixedpoint,
    isomp_quasinewton,
    isomp_simple,
    estimate_stepsize,
    commutator,
    commutator_generic,
    commutator_skewherm,
    euler,
    heun,
    rk4,
    magmp,
    magmp_fixedpoint,
)
from .integrators.mhd import solve_mhd
from .integrators.isospectral import select_skewherm
from . import io
from .io import (
    QuData,
    save,
    load,
    load_basis,
    save_basis,
    get_basis_files,
    get_basis_dirs,
    get_N_for_basis,
    load_basis_hdf5,
    load_basis_npy,
    load_basis_mat,
    save_basis_hdf5,
    convert_mat_to_hdf5_basis,
    determine_qtype,
)
from . import physics
from .physics import energy_euler, enstrophy, inner_H1, inner_Hm1
from . import analysis
from .analysis import (
    scale_decomposition,
    energy_spectrum,
    enstrophy_spectrum,
    random_shr,
    gamma_ratio,
)
from . import dynamics
from .dynamics import project_el, blob, north_blob
from . import sim
from . import simulation  # alias module, reference-compatible name
from .sim import QuSimulation, create_runfile
from .sim.solve import solve, in_notebook
from . import models
from . import parallel
from . import graphics
from .graphics import (
    plot,
    plot2,
    spy,
    resample,
    Animation,
    create_animation,
    create_animation2,
    adjust_colormap_brightness,
)
from . import cluster

__version__ = "0.1.0"
