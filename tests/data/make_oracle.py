"""Generate oracle fixtures by *executing* the reference implementation.

The reference repo (klasmodin/quflow) is expected read-only at
/root/reference.  Its stored golden arrays (tests/test_integrators.py:58-319,
tests/test_laplacian.py:288-308) are stale with respect to its own current
code (verified: the reference itself reproduces them only to ~1.9 abs error),
so we pin regression fixtures against the *current* reference behavior by
running it with numba/ducc0/appdirs shims (numba JIT disabled -> plain
Python; ducc0 only stubbed, SHT fixtures are not generated here).

Run:  python tests/data/make_oracle.py
Outputs: tests/data/oracle.npz  (pure numeric data, no code)
"""

import sys
import types

import numpy as np

OUT = __file__.replace("make_oracle.py", "oracle.npz")


def install_shims():
    numba = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(f):
            return f

        return deco

    numba.njit = njit
    numba.prange = range
    sys.modules["numba"] = numba

    ducc0 = types.ModuleType("ducc0")
    ducc0.misc = types.SimpleNamespace(
        GL_thetas=lambda L: np.arccos(np.polynomial.legendre.leggauss(L)[0])[::-1]
    )
    ducc0.sht = types.SimpleNamespace(
        experimental=types.SimpleNamespace(analysis_2d=None, synthesis_2d=None)
    )
    sys.modules["ducc0"] = ducc0

    appdirs = types.ModuleType("appdirs")
    appdirs.user_data_dir = lambda *a, **k: "/tmp/quflow_oracle_data"
    appdirs.site_data_dir = lambda *a, **k: "/tmp/quflow_oracle_site"
    sys.modules["appdirs"] = appdirs


def main():
    install_shims()
    sys.path.insert(0, "/root/reference")
    import quflow as rqf

    out = {}

    # --- stale-but-kept inputs from the reference test fixtures -------------
    d = np.load(__file__.replace("make_oracle.py", "reference_golden.npz"))
    W0 = d["isomp_W0"]
    out["isomp_W0"] = W0
    out["isomp_stepsize"] = d["isomp_stepsize"]
    out["isomp_steps"] = d["isomp_steps"]
    out["smooth_omegar"] = d["smooth_omegar"]

    # --- isospectral midpoint, 500 steps ------------------------------------
    dt = rqf.hbar(16) * float(d["isomp_stepsize"])
    W = W0.copy()
    W = rqf.integrators.isomp(W, dt, int(d["isomp_steps"]), tol=1e-10)
    out["isomp_Wfinal"] = W

    # --- solve_poisson / heat / viscdamp on a nontrivial state ---------------
    # NOTE: the reference's cpu solve_poisson returns its *internal cached
    # buffer* (cpu.py _cpu_buffer_cache), which later same-N solves silently
    # overwrite - copy immediately (quflow_tpu returns fresh arrays).
    out["poisson_P"] = np.array(rqf.solve_poisson(W0))
    W9 = rqf.shr2mat(d["smooth_omegar"], N=9)
    out["smooth_W9"] = W9
    out["heat_W9"] = rqf.laplacian.solve_heat(1e-3, W9.copy())
    Wt = W9.copy()
    for _ in range(100):
        Wt = rqf.laplacian.solve_viscdamp(0.1, Wt, nu=1e-2, alpha=0.6, theta=0.7)
    out["viscdamp_omegatref"] = rqf.mat2shr(Wt)

    # --- quantization basis + transforms ------------------------------------
    out["basis_17"] = rqf.compute_basis(17)
    rng = np.random.RandomState(3)
    omega17 = rng.randn(17**2)
    out["omega17"] = omega17
    out["shr2mat_W17"] = rqf.shr2mat(omega17, N=17)
    out["mat2shr_back17"] = rqf.mat2shr(out["shr2mat_W17"])
    omc = rng.randn(10**2) + 1j * rng.randn(10**2)
    out["omegac10"] = omc
    out["shc2mat_W10"] = rqf.shc2mat(omc, N=10)
    out["shr2shc_17"] = rqf.shr2shc(omega17)

    # --- explicit integrators + curvature ------------------------------------
    W16 = rqf.shr2mat(omega17[: 12**2], N=16)
    dt16 = 0.05 * rqf.hbar(16)
    out["erk_W0"] = W16
    out["erk_dt"] = dt16
    out["euler_50"] = rqf.integrators.euler(W16.copy(), dt16, steps=50)
    out["heun_50"] = rqf.integrators.heun(W16.copy(), dt16, steps=50)
    out["rk4_50"] = rqf.integrators.rk4(W16.copy(), dt16, steps=50)
    out["isomp_simple_50"] = rqf.integrators.isomp_simple(W16.copy(), dt16, steps=50)

    from quflow import physics as rphys

    F = np.array(rqf.solve_poisson(W16))  # copy: aliased internal buffer
    G = np.array(rqf.solve_poisson(rqf.shr2mat(np.random.RandomState(9).randn(12**2), N=16)))
    out["curv_F"] = F
    out["curv_G"] = G
    out["curv_K"] = np.float64(rphys.sectional_curvature(F, G))

    # --- global quasi-geostrophic solve --------------------------------------
    from quflow.laplacian import cpu as rcpu

    Wqg = np.asarray(out["smooth_W9"])
    out["globalqg_P9"] = np.array(rcpu.solve_globalqg(Wqg.copy(), gamma=0.7))

    # --- mhd (magnetic midpoint) ---------------------------------------------
    from quflow.integrators import mhd as rmhd

    N = 12
    rng = np.random.RandomState(7)

    def randsk(N):
        A = rng.randn(N, N) + 1j * rng.randn(N, N)
        A = A - A.conj().T
        return A - np.eye(N) * np.trace(A) / N

    state = np.zeros((2, N, N), dtype=complex)
    state[0] = randsk(N)
    state[1] = 0.1 * randsk(N)
    out["mhd_state0"] = state.copy()
    st = state.copy()
    dtm = 0.1 * rqf.hbar(N)
    st = rmhd.magmp_fixedpoint(st, dtm, steps=20, tol=1e-12, maxit=20)
    out["mhd_state20"] = st
    out["mhd_dt"] = dtm

    # --- project_el / blob / rotate ------------------------------------------
    from quflow import dynamics as rdyn

    Wp = rqf.shr2mat(omega17, N=17)
    out["project_el_5"] = rdyn.project_el(Wp, el=5)
    out["project_el_5_comp"] = rdyn.project_el(Wp, el=5, complement=True)
    out["north_blob_9"] = rdyn.north_blob(9, sigma=0.2)
    xi = np.array([0.3, -0.2, 0.5])
    out["rotate_xi"] = xi
    out["rotate_W9"] = rqf.geometry.rotate(xi, W9)

    np.savez_compressed(OUT, **out)
    print("wrote", OUT, "with", len(out), "arrays")


if __name__ == "__main__":
    main()
