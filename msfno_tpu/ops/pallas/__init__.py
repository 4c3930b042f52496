# Export the kernel modules (not their same-named functions, which would
# shadow the submodule attribute and break `import ...pallas.spectral_mlp`).
from msfno_tpu.ops.pallas import dft, spectral_mlp  # noqa: F401


def resolve_interpret(interpret: bool) -> bool:
    """Compiled Pallas is TPU-only; the CPU backend gets interpret mode.

    Single home for the backend check so every kernel gates identically."""
    import jax

    return interpret or jax.default_backend() == "cpu"
