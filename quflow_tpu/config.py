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

# Scientific default: bare matmuls (the reference-parity integrators' GEMMs)
# run f32-accurate on the MXU rather than single-pass bf16.  Explicit
# ``precision=`` arguments (the production stepper's knob) still override.
# This also avoids the TPU runtime's unimplemented default-precision complex
# matmul path for device-resident c64 state.
# Respect an explicit user choice (flag env or prior config) - only
# install our default when none is set.  NOTE this IS a process-global
# side effect: unrelated JAX code in the same process will also run its
# bare matmuls f32-accurate.  Opt out with QUFLOW_TPU_MATMUL_PRECISION=default.
if (
    os.environ.get("JAX_DEFAULT_MATMUL_PRECISION") is None
    and jax.config.jax_default_matmul_precision is None  # programmatic choice
):
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("QUFLOW_TPU_MATMUL_PRECISION", "highest"),
    )

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


# ---------------------------------------------------------------------------
# complex host<->device boundary
#
# The TPU runtime in this environment does not implement complex
# host<->device transfers (UNIMPLEMENTED); complex arithmetic *on* device is
# fully supported.  These helpers make the reference-parity integrator APIs
# (qf.isomp / erk / magmp) work with complex64 state on an accelerator-default
# host by crossing the boundary as split real planes recombined/split by tiny
# jitted programs - the same boundary the production stepper uses
# (parallel/stepper.py planes I/O; cf. the reference's CUDA path solving
# Re/Im planes separately, reference experimental/cuda.py:364-418).
# ---------------------------------------------------------------------------

def _target_platform():
    """Platform arrays will land on: honors an active jax.default_device
    context (device_for_dtype routes 64-bit work to CPU), else the default
    backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev))
    return jax.default_backend()


_plane_fns = {}


def device_put_complex(W):
    """Upload a host array to the target device; complex arrays destined for
    a non-CPU backend go as split real planes."""
    import jax.numpy as jnp

    W = _np.asarray(W)
    if not _np.iscomplexobj(W) or _target_platform() == "cpu":
        return jnp.asarray(W)
    if "combine" not in _plane_fns:
        from jax import lax

        _plane_fns["combine"] = jax.jit(lambda p: lax.complex(p[0], p[1]))
    planes = jnp.asarray(_np.ascontiguousarray(_np.stack([W.real, W.imag])))
    return _plane_fns["combine"](planes)


def device_get_complex(Wj):
    """Download a device array to host numpy; complex arrays on a non-CPU
    device come back as split real planes."""
    import jax.numpy as jnp

    if not jnp.iscomplexobj(Wj):
        return _np.asarray(Wj)
    try:
        platform = list(Wj.devices())[0].platform
    except Exception:
        platform = _target_platform()
    if platform == "cpu":
        return _np.asarray(Wj)
    if "split" not in _plane_fns:
        _plane_fns["split"] = jax.jit(lambda w: jnp.stack([w.real, w.imag]))
    p = _np.asarray(_plane_fns["split"](Wj))
    return p[0] + 1j * p[1]
