// Native host kernels for quflow_tpu.
//
// The reference implements its CPU hot path as numba-JIT kernels (Thomas
// sweeps per packed diagonal, diag pack/unpack, conj-subtract; reference
// quflow/laplacian/cpu.py, tridiagonal.py, integrators/isospectral.py:66-81)
// and its GPU path as raw CUDA kernels (experimental/cuda.py).  numba is not
// a dependency here; these OpenMP C++ kernels are the native equivalent for
// the host side (I/O transforms, CPU fallback, baseline measurements).
//
// Build: make -C native   (produces libquflow_host.so, loaded via ctypes)

#include <complex>
#include <cstdint>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

using cplx = std::complex<double>;

extern "C" {

// Prefactorized batched tridiagonal solve on packed rows.
// w, binv, u: (R, N) factor arrays (see quflow_tpu/ops/tridiag.py).
// d: (C, R, N) right-hand-side channels (e.g. C=2 for re/im), solved in place.
void thomas_batch_d(const double* w, const double* binv, const double* u,
                    double* d, int64_t C, int64_t R, int64_t N) {
#pragma omp parallel for collapse(2) schedule(static)
    for (int64_t c = 0; c < C; ++c) {
        for (int64_t r = 0; r < R; ++r) {
            const double* wr = w + r * N;
            const double* br = binv + r * N;
            const double* ur = u + r * N;
            double* dr = d + (c * R + r) * N;
            // forward elimination
            for (int64_t i = 1; i < N; ++i)
                dr[i] -= wr[i] * dr[i - 1];
            // back substitution
            dr[N - 1] *= br[N - 1];
            for (int64_t i = N - 2; i >= 0; --i)
                dr[i] = dr[i] * br[i] - ur[i] * dr[i + 1];
        }
    }
}

// Skew-Hermitian diag pack: W (N, N) complex -> d (R, N) complex with
// R = N/2 + 1; row m = [lower diag m | lower diag N-m].
void pack_diagh_z(const cplx* W, cplx* d, int64_t N) {
    const int64_t R = N / 2 + 1;
#pragma omp parallel for schedule(static)
    for (int64_t m = 0; m < R; ++m) {
        cplx* dm = d + m * N;
        for (int64_t i = 0; i < N - m; ++i)
            dm[i] = W[(i + m) * N + i];
        for (int64_t j = 0; j < m; ++j)
            dm[N - m + j] = W[(N - m + j) * N + j];
    }
}

// Inverse scatter imposing skew-Hermitian symmetry: upper = -conj(lower).
void unpack_diagh_z(const cplx* d, cplx* W, int64_t N) {
    const int64_t R = N / 2 + 1;
#pragma omp parallel for schedule(static)
    for (int64_t m = 0; m < R; ++m) {
        const cplx* dm = d + m * N;
        for (int64_t i = 0; i < N - m; ++i) {
            W[(i + m) * N + i] = dm[i];
            if (m != 0)
                W[i * N + (i + m)] = -std::conj(dm[i]);
        }
        for (int64_t j = 0; j < m; ++j) {
            W[(N - m + j) * N + j] = dm[N - m + j];
            W[j * N + (N - m + j)] = -std::conj(dm[N - m + j]);
        }
    }
}

// In-place A <- A - A^H (reference conj_subtract_, isospectral.py:66-81).
void conj_subtract_z(cplx* A, int64_t N) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < N; ++i) {
        A[i * N + i] = A[i * N + i] - std::conj(A[i * N + i]);
        for (int64_t j = 0; j < i; ++j) {
            cplx v = A[i * N + j] - std::conj(A[j * N + i]);
            A[i * N + j] = v;
            A[j * N + i] = -std::conj(v);
        }
    }
}

// Full skew-Hermitian Poisson solve: pack -> trace bc -> Thomas -> trace
// projection -> unpack.  W, P: (N, N) complex; factors as in thomas_batch_d
// with R = N/2 + 1.
void solve_poisson_skewh_z(const double* w, const double* binv,
                           const double* u, const cplx* W, cplx* P,
                           cplx* scratch /* R*N */, int64_t N) {
    const int64_t R = N / 2 + 1;
    pack_diagh_z(W, scratch, N);
    // trace bc on row 0
    cplx tr = 0.0;
    for (int64_t i = 0; i < N; ++i) tr += scratch[i];
    tr /= (double)N;
    for (int64_t i = 0; i < N; ++i) scratch[i] -= tr;
    // solve re/im planes (interleaved complex = 2 real channels with
    // stride 2; do complex arithmetic directly, coefficients are real)
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < R; ++r) {
        const double* wr = w + r * N;
        const double* br = binv + r * N;
        const double* ur = u + r * N;
        cplx* dr = scratch + r * N;
        for (int64_t i = 1; i < N; ++i)
            dr[i] -= wr[i] * dr[i - 1];
        dr[N - 1] *= br[N - 1];
        for (int64_t i = N - 2; i >= 0; --i)
            dr[i] = dr[i] * br[i] - ur[i] * dr[i + 1];
    }
    // trace projection
    tr = 0.0;
    for (int64_t i = 0; i < N; ++i) tr += scratch[i];
    tr /= (double)N;
    for (int64_t i = 0; i < N; ++i) scratch[i] -= tr;
    unpack_diagh_z(scratch, P, N);
}

int omp_thread_count() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
