"""Global configuration for quflow_tpu.

The reference framework (klasmodin/quflow) mutates module-global function
pointers at runtime (e.g. ``select_skewherm``, see reference
quflow/integrators/isospectral.py:97-118).  That pattern is hostile to XLA
tracing, so here all configuration is either

* a static argument threaded through jitted functions, or
* a process-level default set *before* first trace (this module).

Precision: the quantized-vorticity scheme needs float64 to reach the
reference's conservation gates (Casimir drift ~1e-10, golden-state atol 1e-7),
so x64 is enabled on import unless QUFLOW_TPU_X64=0.
"""

import os

# Enable x64 before anything traces.  Users can opt out for a pure-f32 fast
# path (bench exposes both).
import contextlib

import jax

# The axon TPU plugin in this environment overrides JAX_PLATFORMS at import
# time; re-assert the user's choice so `JAX_PLATFORMS=cpu` behaves normally.
# When the accelerator is primary, keep CPU registered as a secondary
# platform: the TPU v5e has no complex128/float64 matmuls, so 64-bit host
# API calls are routed to CPU (see device_for_dtype).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat and "axon" not in _plat:
    jax.config.update("jax_platforms", _plat)
elif _plat and "cpu" not in _plat:
    jax.config.update("jax_platforms", _plat + ",cpu")

if os.environ.get("QUFLOW_TPU_X64", "1") not in ("0", "false", "False"):
    jax.config.update("jax_enable_x64", True)
    X64 = True
else:
    X64 = False

import numpy as _np

#: Default real/complex dtypes for simulation state.
default_real_dtype = _np.float64 if X64 else _np.float32
default_complex_dtype = _np.complex128 if X64 else _np.complex64


def default_dtypes():
    return default_real_dtype, default_complex_dtype


def device_for_dtype(dtype):
    """Context manager placing computation for ``dtype``: 64-bit dtypes go
    to CPU when the default backend is an accelerator without f64/c128
    support (TPU); everything else uses the default device."""
    dt = _np.dtype(dtype)
    if dt in (_np.dtype(_np.float64), _np.dtype(_np.complex128)):
        try:
            if jax.devices()[0].platform != "cpu":
                return jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:  # pragma: no cover
            pass
    return contextlib.nullcontext()
