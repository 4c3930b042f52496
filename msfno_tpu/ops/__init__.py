from msfno_tpu.ops.sht import RealSHT, InverseRealSHT  # noqa: F401
from msfno_tpu.ops.fft import RealFFT2, InverseRealFFT2  # noqa: F401
from msfno_tpu.ops.contractions import (  # noqa: F401
    to_complex,
    compl_mul,
    compl_muladd,
    compl_contract_dense,
    compl_contract_tril,
    contract_tt,
)
from msfno_tpu.ops.activations import complex_relu  # noqa: F401
