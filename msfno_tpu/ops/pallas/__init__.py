def kernel_mxu_dtype(mxu_dtype: str):
    """Map the config-level mxu_dtype knob to a storage dtype for Pallas
    kernels.  'tensorfloat' names a jax.lax.Precision tier (3-pass bf16 on
    fp32 inputs — see ops/sht.py precision ladder), not a dtype, so kernels
    run it as fp32 inputs; jnp.dtype('tensorfloat') would TypeError."""
    import jax.numpy as jnp

    if mxu_dtype == "tensorfloat":
        return jnp.dtype(jnp.float32)
    return jnp.dtype(mxu_dtype)


def resolve_interpret(interpret: bool) -> bool:
    """Compiled Pallas is TPU-only; the CPU backend gets interpret mode.

    Single home for the backend check so every kernel gates identically."""
    import jax

    return interpret or jax.default_backend() == "cpu"


# Export the kernel modules (not their same-named functions, which would
# shadow the submodule attribute and break `import ...pallas.spectral_mlp`).
# These imports must FOLLOW the helper defs above: the submodules import the
# helpers from this package at their own import time.
from msfno_tpu.ops.pallas import dft, spectral_mlp  # noqa: E402,F401
