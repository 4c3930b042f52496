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


def test_malicious_builtins_global_is_inert(tmp_path):
    """A pickle smuggling GLOBAL builtins.exec/eval must not execute:
    find_class allowlists only data constructors (the module's untrusted-
    file guarantee)."""
    canary = str(tmp_path / "pwned")
    code = f"open({canary!r}, 'w').write('x')".encode()
    evil = b"\x80\x02cbuiltins\nexec\n(X" + len(code).to_bytes(4, "little") \
        + code + b"tR."
    path = str(tmp_path / "evil.pt")
    with open(path, "wb") as f:
        f.write(evil)
    import os

    try:
        load_torch_checkpoint(path)
    except Exception:
        pass  # rejecting is fine; executing is not
    assert not os.path.exists(canary), "malicious pickle executed code"


def test_legacy_view_metadata(tmp_path):
    """Legacy persistent ids can reference a VIEW into a root storage; the
    tensor's storage_offset is view-relative.  Crafted stream (modern torch
    cannot emit one), root = arange(12), view = root[4:10], tensor = view
    with offset 1, size (4,) -> expect [5, 6, 7, 8]."""
    import io
    import pickle
    import struct

    class _StoragePid:
        """Pickles via persistent_id below."""

    storage_marker = _StoragePid()

    class _Pickler(pickle.Pickler):
        def persistent_id(self, obj):
            if obj is storage_marker:
                return ("storage", torch.FloatStorage, "0", "cpu", 12,
                        ("0v", 4, 6))
            return None

    class _TensorStandIn:
        def __reduce__(self):
            return (
                torch._utils._rebuild_tensor_v2,
                (storage_marker, 1, (4,), (1,), False, None),
            )

    buf = io.BytesIO()
    for head in (0x1950A86A20F9469CFC6C, 1001,
                 {"little_endian": True}):
        pickle.dump(head, buf, protocol=2)
    _Pickler(buf, protocol=2).dump({"w": _TensorStandIn()})
    pickle.dump(["0"], buf, protocol=2)  # storage key order
    buf.write(struct.pack("<q", 12))
    buf.write(np.arange(12, dtype=np.float32).tobytes())
    path = str(tmp_path / "legacy_view.pt")
    with open(path, "wb") as f:
        f.write(buf.getvalue())

    arrs = state_dict_arrays(load_torch_checkpoint(path))
    np.testing.assert_array_equal(
        arrs["w"], np.array([5, 6, 7, 8], np.float32)
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
