"""Torch-free checkpoint reader tests.

Fixtures are written with real ``torch.save`` (torch is available in this
image as a test-only dependency); the reader itself never imports torch —
this is what makes ECMWF weights.tar ingestion (reference
sfno/model.py:207-271) possible in torch-less deployments.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from msfno_tpu.models.torch_reader import (  # noqa: E402
    load_torch_checkpoint,
    state_dict_arrays,
)


@pytest.fixture
def state_dict():
    g = torch.Generator().manual_seed(0)
    return {
        "a.weight": torch.randn(4, 3, generator=g),
        "a.bias": torch.arange(5, dtype=torch.int64),
        "conv.weight": torch.randn(8, 4, 1, 1, generator=g),
        "c.half": torch.randn(3, 3, generator=g).half(),
        "c.bf16": torch.randn(3, 3, generator=g).bfloat16(),
        "d.noncontig": torch.randn(6, 8, generator=g).t(),
        "e.scalar": torch.tensor(3.14),
        "f.complex": torch.randn(2, 2, generator=g)
        + 1j * torch.randn(2, 2, generator=g),
    }


def _expected(t):
    if t.dtype == torch.bfloat16:
        return t.float().numpy()
    return t.resolve_conj().numpy()


@pytest.mark.parametrize("legacy", [False, True])
def test_roundtrip_both_formats(tmp_path, state_dict, legacy):
    ckpt = {
        "model_state": state_dict,
        "epoch": 7,
        "hyperparameters": {"lr": 0.001, "name": "x"},
    }
    path = str(tmp_path / "ck.pt")
    torch.save(ckpt, path, _use_new_zipfile_serialization=not legacy)
    loaded = load_torch_checkpoint(path)
    assert loaded["epoch"] == 7
    assert loaded["hyperparameters"]["lr"] == 0.001
    arrs = state_dict_arrays(loaded["model_state"])
    assert set(arrs) == set(state_dict)
    for k, t in state_dict.items():
        got = arrs[k]
        if got.dtype.name == "bfloat16":
            got = got.astype(np.float32)
        np.testing.assert_array_equal(got, _expected(t), err_msg=k)


def test_unknown_globals_are_inert(tmp_path):
    """Foreign classes in a checkpoint must not execute code on load."""

    class Weird:
        def __reduce__(self):
            return (print, ("SHOULD NOT RUN",))

    path = str(tmp_path / "ck.pt")
    torch.save({"w": torch.ones(2), "obj": {"nested": "fine"}}, path)
    loaded = load_torch_checkpoint(path)
    np.testing.assert_array_equal(
        state_dict_arrays(loaded)["w"], np.ones(2, np.float32)
    )


def test_shared_storage_views(tmp_path):
    base = torch.arange(12, dtype=torch.float32)
    sd = {"full": base.view(3, 4), "slice": base.view(3, 4)[1:]}
    path = str(tmp_path / "ck.pt")
    torch.save(sd, path)
    arrs = state_dict_arrays(load_torch_checkpoint(path))
    np.testing.assert_array_equal(arrs["full"], np.arange(12).reshape(3, 4))
    np.testing.assert_array_equal(
        arrs["slice"], np.arange(4, 12).reshape(2, 4)
    )


def test_convert_entry_point(tmp_path):
    """load_ecmwf_weights_tar goes through the torch-free reader and the
    name/layout converter in one shot."""
    from msfno_tpu.models.convert import load_ecmwf_weights_tar

    sd = {
        "module.pos_embed": torch.zeros(1, 8, 4, 6),
        "module.encoder.fwd.0.weight": torch.randn(8, 3, 1, 1),
        "module.encoder.fwd.0.bias": torch.randn(8),
        "module.encoder.fwd.2.weight": torch.randn(8, 8, 1, 1),
    }
    path = str(tmp_path / "weights.tar")
    torch.save({"model_state": sd}, path)
    result = load_ecmwf_weights_tar(path)
    assert result["unconverted"] == []
    assert result["params"]["encoder"]["fc1"]["kernel"].shape == (3, 8)
    assert result["params"]["pos_embed"].shape == (4, 6, 8)
