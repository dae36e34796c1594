"""File I/O: basis persistence, generic save/load, QuData legacy callback.

Functional parity with reference quflow/io.py (basis search path :98-136,
HDF5/npy/npz/mat formats :34-95 and :506-548, ``QuData`` :211-329,
``save``/``load`` :332-471).  The basis file format is compatible with the
reference ('BASIS_<N>' HDF5 datasets), so precomputed bases interchange.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "load_basis",
    "save_basis",
    "get_basis_dirs",
    "get_basis_files",
    "get_N_for_basis",
    "QuData",
    "save",
    "load",
]

_DEFAULT_BASIS_FILENAME = "quflow_basis.hdf5"


def get_N_for_basis(basis_len):
    """Invert N from len = sum_{m<N} (N-m)^2 = N(N+1)(2N+1)/6."""
    N = int(round((3.0 * basis_len) ** (1.0 / 3.0)))
    for cand in (N - 1, N, N + 1):
        if cand > 0 and cand * (cand + 1) * (2 * cand + 1) // 6 == basis_len:
            return cand
    raise ValueError(f"No N found for basis length {basis_len}.")


def get_basis_dirs():
    """Search directories: $QUFLOW_BASIS_PATH (colon list) then a per-user
    data dir (~/.local/share/quflow, replacing the reference's appdirs)."""
    dirs = []
    env = os.environ.get("QUFLOW_BASIS_PATH", "")
    for d in env.split(":"):
        if d:
            dirs.append(d)
    home = os.path.expanduser("~")
    dirs.append(os.path.join(home, ".local", "share", "quflow"))
    return dirs


def get_basis_files(basis_filename=None):
    files = []
    names = (
        [basis_filename]
        if basis_filename
        else [os.environ.get("QUFLOW_BASIS_FILENAME", _DEFAULT_BASIS_FILENAME)]
    )
    for d in get_basis_dirs():
        for nm in names:
            f = os.path.join(d, nm)
            if os.path.isfile(f):
                files.append(f)
    return files


def _load_basis_hdf5(path, N):
    import h5py

    with h5py.File(path, "r") as f:
        key = f"BASIS_{N}"
        if key in f:
            return f[key][()]
    return None


def _load_basis_npy(path, N):
    basis = np.load(path, allow_pickle=False)
    if isinstance(basis, np.lib.npyio.NpzFile):
        key = f"BASIS_{N}"
        basis = basis[key] if key in basis else None
    if basis is not None and get_N_for_basis(basis.shape[0]) != N:
        return None
    return basis


def load_basis(N):
    """Look for a precomputed basis for band limit N on disk."""
    for path in get_basis_files():
        try:
            if path.endswith((".hdf5", ".h5")):
                basis = _load_basis_hdf5(path, N)
            elif path.endswith((".npy", ".npz")):
                basis = _load_basis_npy(path, N)
            elif path.endswith(".mat"):
                from scipy.io import loadmat

                data = loadmat(path)
                basis = data.get(f"BASIS_{N}", None)
                if basis is not None:
                    basis = basis.ravel()
            else:
                continue
        except (OSError, ValueError):
            continue
        if basis is not None:
            return np.ascontiguousarray(basis)
    return None


def save_basis(basis, path=None):
    """Append the basis to the (first writable) basis file as BASIS_<N>."""
    import h5py

    N = get_N_for_basis(basis.shape[0])
    if path is None:
        d = get_basis_dirs()[-1]
        os.makedirs(d, exist_ok=True)
        path = os.path.join(
            d, os.environ.get("QUFLOW_BASIS_FILENAME", _DEFAULT_BASIS_FILENAME)
        )
    with h5py.File(path, "a") as f:
        key = f"BASIS_{N}"
        if key in f:
            del f[key]
        ds = f.create_dataset(key, data=basis)
        ds.attrs["QUFLOW_VERSION"] = "quflow_tpu"
    return path


# ---------------------------------------------------------------------------
# generic state save/load + legacy QuData callback
# ---------------------------------------------------------------------------

def save(filename, data, qtype="shr", name="state", attrs=None):
    """Save a state (in representation ``qtype``) to an HDF5 file."""
    import h5py

    with h5py.File(filename, "a") as f:
        if name in f:
            del f[name]
        ds = f.create_dataset(name, data=np.asarray(data))
        ds.attrs["qtype"] = qtype
        for k, v in (attrs or {}).items():
            ds.attrs[k] = v


def load(filename, name="state"):
    import h5py

    with h5py.File(filename, "r") as f:
        return f[name][()]


class QuData:
    """Legacy buffered HDF5 writer callback (reference io.py:211-329).

    Caches up to ``cache_size`` states in memory and flushes at least every
    ``max_wait`` seconds.  The modern interface is sim.QuSimulation.
    """

    def __init__(self, filename, cache_size=20, max_wait=60.0, qtype="shr", verbatim=False):
        self.filename = filename
        self.cache_size = cache_size
        self.max_wait = max_wait
        self.qtype = qtype
        self.verbatim = verbatim
        self._cache = []
        self._times = []
        import time as _time

        self._last_flush = _time.time()
        self.qtime = 0.0

    def __call__(self, W, inner_time=None, inner_steps=None, delta_time=None,
                 **kwargs):
        from .quantization import mat2shr

        if inner_time is None and delta_time is not None:
            inner_time = delta_time  # modern driver callback signature
        if inner_time is not None:
            self.qtime += float(inner_time)
        data = mat2shr(np.asarray(W)) if self.qtype == "shr" else np.asarray(W)
        self._cache.append(data)
        self._times.append(self.qtime)
        import time as _time

        now = _time.time()
        if len(self._cache) >= self.cache_size or now - self._last_flush > self.max_wait:
            self.flush()

    def flush(self):
        if not self._cache:
            return
        import h5py
        import time as _time

        with h5py.File(self.filename, "a") as f:
            block = np.stack(self._cache)
            times = np.asarray(self._times)
            if "state" not in f:
                f.create_dataset(
                    "state",
                    data=block,
                    maxshape=(None,) + block.shape[1:],
                    chunks=True,
                )
                f.create_dataset("qtime", data=times, maxshape=(None,), chunks=True)
            else:
                ds = f["state"]
                n0 = ds.shape[0]
                ds.resize(n0 + block.shape[0], axis=0)
                ds[n0:] = block
                dt_ = f["qtime"]
                dt_.resize(n0 + times.shape[0], axis=0)
                dt_[n0:] = times
        self._cache = []
        self._times = []
        self._last_flush = _time.time()

    def __del__(self):
        try:
            self.flush()
        except Exception:
            pass
