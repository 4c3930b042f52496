"""msfno_tpu — TPU-native Modulated Spherical Fourier Neural Operator framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference PyTorch codebase Slusny/Modulated-Spherical-Fourier-Neural-Operator
(see /root/reference), re-designed TPU-first:

- channels-last (B, H, W, C) layout so 1x1-conv MLPs are MXU matmuls
- real spherical harmonic transforms as longitude rFFT + associated-Legendre
  matmul with precomputed fp32 weight tensors (reference: torch_harmonics
  RealSHT used in MSFNO/Models/sfno/sfnonet.py:532-555)
- complex spectral MLPs as paired real matmuls (reference:
  MSFNO/Models/sfno/contractions.py)
- SPMD over jax.sharding.Mesh axes (data, lat, channel) instead of DDP/NCCL
  (reference: main.py:39-49, MSFNO/Models/train.py:370-380)
- Pallas TPU kernels for the hot Legendre / spectral contractions
"""

__version__ = "0.1.0"

from msfno_tpu.utils.config import SFNOConfig, FilmConfig  # noqa: F401
