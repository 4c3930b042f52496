"""Import harness for running the *actual reference model code* as a parity
oracle.

The reference (/root/reference, PyTorch) cannot run as-is in this image:
torch_harmonics, torch_geometric, xarray, climetlab are absent.  This package
installs minimal stubs — including an independently implemented, scipy-based
torch_harmonics (see th_stub.py) — so that ``MSFNO.Models.sfno.sfnonet`` can
be imported and executed on CPU.  Reference outputs generated this way are
the oracle for converter/forward parity tests (tests/test_reference_parity.py):
every part of the network except the SHT internals (weight layouts, block
wiring, norms, activations, skips) is exercised by the reference's own code.

The reference tree is imported read-only; nothing here modifies it.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs() -> None:
    """Idempotently register stub modules required by the reference imports."""
    if "torch_harmonics" in sys.modules and hasattr(
        sys.modules["torch_harmonics"], "_msfno_stub"
    ):
        return

    from tests.ref_compat import th_stub

    th = _module(
        "torch_harmonics",
        RealSHT=th_stub.RealSHT,
        InverseRealSHT=th_stub.InverseRealSHT,
        _msfno_stub=True,
    )
    quad = _module(
        "torch_harmonics.quadrature",
        legendre_gauss_weights=th_stub.legendre_gauss_weights,
        clenshaw_curtiss_weights=th_stub.clenshaw_curtiss_weights,
    )
    th.quadrature = quad

    # torch_geometric: imported by MSFNO.Models.gcn.gcn; only instantiated for
    # the "gcn" film generator, which the parity tests do not construct.
    class _NotBuilt:
        def __init__(self, *a, **k):
            raise RuntimeError("torch_geometric stub: GCNConv not available")

    tg = _module("torch_geometric")
    tg_nn = _module(
        "torch_geometric.nn", GCNConv=_NotBuilt,
        pool=_module("torch_geometric.nn.pool", global_mean_pool=None),
    )
    tg.nn = tg_nn

    # xarray: imported at sfnonet.py module level, unused by the net itself
    _module("xarray")

    # numpy 2.x removed numpy.lib.arraypad; the reference's
    # `from numpy.lib.arraypad import pad` (layers.py:9) is vestigial
    import numpy as np

    if "numpy.lib.arraypad" not in sys.modules:
        _module("numpy.lib.arraypad", pad=np.pad)

    # climetlab: MSFNO.utils imports utils.humanize.seconds
    cml = _module("climetlab")
    cml_utils = _module("climetlab.utils")
    _module("climetlab.utils.humanize", seconds=lambda s: f"{s}s")
    cml.utils = cml_utils

    # timm: the reference afnonet imports DropPath/trunc_normal_ only
    import torch

    class _DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm = _module("timm")
    timm_models = _module("timm.models")
    _module(
        "timm.models.layers",
        DropPath=_DropPath,
        trunc_normal_=torch.nn.init.trunc_normal_,
    )
    timm.models = timm_models

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def import_reference_afnonet():
    """Import the reference AFNONet module (installing stubs first)."""
    install_stubs()
    import importlib

    return importlib.import_module("MSFNO.Models.fourcastnet.afnonet")


def import_reference_sfnonet():
    """Import the reference sfnonet module (installing stubs first)."""
    install_stubs()
    import importlib

    return importlib.import_module("MSFNO.Models.sfno.sfnonet")


def import_reference_contractions():
    """Import the reference contraction kernels (installing stubs first)."""
    install_stubs()
    import importlib

    return importlib.import_module("MSFNO.Models.sfno.contractions")
