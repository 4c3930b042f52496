from msfno_tpu.ops.pallas.spectral_mlp import spectral_mlp  # noqa: F401
from msfno_tpu.ops.pallas.dft import dft_analysis, dft_synthesis  # noqa: F401
