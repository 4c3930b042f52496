# Export the kernel modules (not their same-named functions, which would
# shadow the submodule attribute and break `import ...pallas.spectral_mlp`).
from msfno_tpu.ops.pallas import dft, spectral_mlp  # noqa: F401
