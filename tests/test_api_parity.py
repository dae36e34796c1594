"""Top-level API parity with the reference package.

The reference star-exports its transforms/utils/quantization/graphics/
simulation/integrators/io modules at package top level (reference
quflow/__init__.py:1-18), so e.g. ``qf.plot`` and ``qf.QuData`` resolve
directly.  This test walks the reference's public names (enumerated
statically from its source -- the reference itself is not importable here,
it requires numba) and asserts each resolves on quflow_tpu.
"""

import quflow_tpu as qf

# Public names reachable from `import quflow as qf` in the reference,
# excluding third-party leaks of its star imports (np, plt, scipy helpers...)
# which are incidental namespace pollution, not API.
REFERENCE_PUBLIC_NAMES = [
    # transforms (reference transforms.py)
    "forward", "inverse", "fun2shc", "shc2fun", "fun2shr", "shr2fun",
    "shc2shr", "shr2shc", "fun2img", "img2fun", "as_fun", "as_shr",
    # utils (reference utils.py)
    "elm2ind", "ind2elm", "complex_dtype", "real_dtype",
    "berezin_multipliers", "cart2sph", "sph2cart", "sphgrid",
    "qtime2seconds", "seconds2qtime", "poisson_finite_differences",
    "run_cluster",
    # quantization (reference quantization.py)
    "basis_break_index", "adjust_basis_orientation_", "compute_basis",
    "get_basis", "shr2mat", "mat2shr", "shc2mat", "mat2shc",
    "shr2mat_", "mat2shr_", "shc2mat_", "mat2shc_",
    "shr2mat_serial_", "shr2mat_parallel_", "mat2shr_serial_",
    "mat2shr_parallel_", "elmr2mat", "elmc2mat", "compute_direct_laplacian",
    # graphics (reference graphics.py)
    "in_notebook", "adjust_colormap_brightness", "resample", "plot",
    "plot2", "Animation", "create_animation", "create_animation2", "spy",
    # simulation (reference simulation.py)
    "QuSimulation", "create_runfile", "solve",
    # integrators (reference integrators/__init__.py + top-level names)
    "isomp", "isomp_fixedpoint", "isomp_quasinewton", "isomp_simple",
    "commutator", "commutator_generic", "commutator_skewherm",
    "euler", "heun", "rk4", "magmp", "magmp_fixedpoint",
    "solve_mhd", "select_skewherm", "estimate_stepsize",
    # io (reference io.py)
    "QuData", "save", "load", "load_basis", "save_basis",
    "load_basis_hdf5", "load_basis_npy", "load_basis_mat",
    "save_basis_hdf5", "convert_mat_to_hdf5_basis", "determine_qtype",
    "get_basis_dirs", "get_basis_files", "get_N_for_basis",
    # explicit submodule/function imports in reference __init__.py
    "laplacian", "analysis", "scale_decomposition", "integrators",
    "geometry", "inner_L2", "norm_L2", "norm_Linf", "norm_L1",
    "dynamics", "physics", "inner_H1", "inner_Hm1", "energy_euler",
    "enstrophy",
    # laplacian family (resolved via the laplacian submodule in both)
    "solve_poisson",
]


def test_reference_public_names_resolve():
    missing = [n for n in REFERENCE_PUBLIC_NAMES if not hasattr(qf, n)]
    assert not missing, f"missing reference top-level names: {missing}"


def test_backend_module_paths():
    # the reference's per-backend import paths must resolve
    from quflow_tpu.laplacian import cpu, direct, sparse, gpu, tridiagonal

    for mod in (cpu, direct, sparse, gpu, tridiagonal):
        assert hasattr(mod, "solve_poisson")
    assert callable(direct.compute_direct_laplacian)


def test_determine_qtype_dispatch():
    import numpy as np

    N = 8
    assert qf.determine_qtype(np.zeros((3, N, N), complex)) == ("mat", True)
    assert qf.determine_qtype(np.zeros((3, 4, 8), np.uint8)) == ("img", True)
    assert qf.determine_qtype(np.zeros((3, 4, 8))) == ("fun", True)
    assert qf.determine_qtype(np.zeros(N * N)) == ("shr", False)
    assert qf.determine_qtype(np.zeros(N * N, complex)) == ("shc", False)
    assert qf.determine_qtype(np.zeros((4, 8), np.uint8)) == ("img", False)
    assert qf.determine_qtype(np.zeros((N, N), complex), N=N) == ("mat", False)
    assert qf.determine_qtype(np.zeros((3, N * N)), N=N) == ("shr", True)
    assert qf.determine_qtype(np.zeros((4, 8)), N=N) == ("fun", False)
