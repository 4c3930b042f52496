"""Torch-free reader for PyTorch checkpoint files.

The ECMWF pretrained SFNO ships as ``weights.tar`` — despite the name, a
torch.save archive (reference download URL MSFNO/Models/sfno/model.py:38-39,
load path model.py:207-271) — and the reference's own training checkpoints are
``torch.save`` pickles too (train.py:779-819).  This module materializes the
tensors of either format as numpy arrays with zero torch dependency, in the
spirit of the reference's own pickle ``peek()`` hack
(MSFNO/Models/checkpoint.py:9-57) but for full tensor data:

- **zip format** (torch >= 1.6 default): a zipfile containing
  ``<name>/data.pkl`` plus one raw little-endian buffer per storage under
  ``<name>/data/<key>``.  The pickle references storages through
  ``persistent_load`` and rebuilds tensors via ``torch._utils`` helpers, both
  of which are re-implemented here over numpy.
- **legacy format** (``_use_new_zipfile_serialization=False``): a stream of
  consecutive pickles (magic, protocol, sys_info, the object, storage keys)
  followed by the raw storage bytes, each prefixed with an int64 element
  count.

Only tensor/ndarray-bearing pytrees are supported; unknown pickle globals
resolve to inert placeholders rather than executing arbitrary reduces, so
loading is safe on untrusted files (nothing beyond storage wiring runs).
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO

import numpy as np

# torch storage-class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": "bfloat16",
    "ComplexFloatStorage": np.complex64,
    "ComplexDoubleStorage": np.complex128,
}

# torch.<dtype> attribute name -> numpy dtype (TypedStorage path, torch >= 2)
_DTYPE_NAMES = {
    "float32": np.float32,
    "float64": np.float64,
    "float16": np.float16,
    "int64": np.int64,
    "int32": np.int32,
    "int16": np.int16,
    "int8": np.int8,
    "uint8": np.uint8,
    "bool": np.bool_,
    "bfloat16": "bfloat16",
    "complex64": np.complex64,
    "complex128": np.complex128,
}


def _np_dtype(spec):
    """Resolve a storage marker's dtype spec to a concrete numpy dtype.
    bfloat16 uses ml_dtypes (shipped with jax) when available, else the
    tensor is widened from raw uint16 to fp32 at rebuild time."""
    if spec == "bfloat16":
        try:
            import ml_dtypes

            return np.dtype(ml_dtypes.bfloat16)
        except ImportError:  # pragma: no cover
            return None  # sentinel: manual widen in _rebuild
    return np.dtype(spec)


class _StorageType:
    """Placeholder for ``torch.FloatStorage`` etc. in the pickle stream."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self):
        return _STORAGE_DTYPES[self.name]


class _DTypeRef:
    """Placeholder for ``torch.float32`` etc. (TypedStorage checkpoints)."""

    def __init__(self, name: str):
        self.name = name


class _Placeholder:
    """Inert stand-in for unknown globals: absorbs any reduce without
    executing code and records what it replaced."""

    def __init__(self, module: str, name: str):
        self._qualname = f"{module}.{name}"

    def __call__(self, *a, **k):
        return self

    def __setstate__(self, state):
        self._state = state

    def __repr__(self):
        return f"<unloaded {self._qualname}>"


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """uint16 bfloat16 bit pattern -> float32 (big-endian pad trick)."""
    u32 = raw.astype(np.uint32) << 16
    return u32.view(np.float32)


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False,
    backward_hooks=None, metadata=None,
):
    """numpy re-implementation of torch._utils._rebuild_tensor_v2: view the
    flat storage buffer through (size, stride) in elements."""
    arr, itemsize = storage
    size = tuple(size)
    stride = tuple(stride)
    byte_strides = tuple(s * itemsize for s in stride)
    base = arr[storage_offset:]
    view = np.lib.stride_tricks.as_strided(
        base, shape=size, strides=byte_strides, writeable=False
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    """Unpickler resolving torch rebuild helpers to numpy equivalents and
    everything else to inert placeholders (no arbitrary code execution)."""

    def __init__(self, f, load_storage):
        super().__init__(f, encoding="latin1")
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch":
            if name in _STORAGE_DTYPES:
                return _StorageType(name)
            if name in _DTYPE_NAMES:
                return _DTypeRef(name)
            if name == "Size":
                return tuple
        if module == "torch.storage" and name == "TypedStorage":
            return _StorageType  # not instantiated in practice
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module in ("numpy", "numpy.core.multiarray", "numpy._core.multiarray"):
            import numpy.core.multiarray as ma

            if name == "_reconstruct":
                return ma._reconstruct
            if name == "scalar":
                return ma.scalar
            return getattr(np, name, _Placeholder(module, name))
        if module == "builtins":
            # allowlist only data constructors: a blanket getattr(builtins,
            # name) would hand a malicious pickle exec/eval/__import__ and
            # void the module's untrusted-file guarantee
            if name in (
                "complex", "set", "frozenset", "bytearray", "list", "dict",
                "tuple", "int", "float", "bool", "str", "bytes", "slice",
            ):
                import builtins

                return getattr(builtins, name)
            return _Placeholder(module, name)
        return _Placeholder(module, name)

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1:5]
        if isinstance(storage_type, _DTypeRef):
            dtype_spec = _DTYPE_NAMES[storage_type.name]
        else:
            dtype_spec = storage_type.dtype
        return self._load_storage(key, dtype_spec, numel)


def _read_zip(zf: zipfile.ZipFile) -> Any:
    names = zf.namelist()
    pkl_name = next(
        (n for n in names if n.endswith("/data.pkl") or n == "data.pkl"), None
    )
    if pkl_name is None:
        raise ValueError("torch zip checkpoint has no data.pkl entry")
    prefix = pkl_name[: -len("data.pkl")]
    cache: dict[str, tuple[np.ndarray, int]] = {}

    def load_storage(key, dtype_spec, numel):
        skey = str(key)
        if skey not in cache:
            raw = zf.read(f"{prefix}data/{skey}")
            dt = _np_dtype(dtype_spec)
            if dt is None:  # bfloat16 without ml_dtypes: widen to fp32
                typed = _bf16_to_f32(np.frombuffer(raw, dtype=np.uint16))
            else:
                typed = np.frombuffer(raw, dtype=dt)
            cache[skey] = (typed, typed.dtype.itemsize)
        return cache[skey]

    with zf.open(pkl_name) as f:
        return _TorchUnpickler(f, load_storage).load()


def _safe_pickle_load(f: BinaryIO) -> Any:
    """Stock-pickle replacement for the legacy stream's header/footer
    pickles (magic int, protocol, sys-info dict, storage-key list): they
    contain only literals, so resolving ANY global would mean a hostile
    file — plain pickle.load here would be the exec hole the main
    unpickler's allowlist closes."""

    class _NoGlobals(pickle.Unpickler):
        def find_class(self, module, name):
            raise pickle.UnpicklingError(
                f"legacy header pickle requested global {module}.{name}"
            )

        def persistent_load(self, pid):
            raise pickle.UnpicklingError("unexpected persistent id in header")

    return _NoGlobals(f, encoding="latin1").load()


def _read_legacy(f: BinaryIO) -> Any:
    """Legacy torch.save stream: magic, protocol, sys_info pickles, the object
    pickle (with persistent storage ids), the storage-key list pickle, then
    per-key raw data each prefixed by int64 element count."""
    magic = _safe_pickle_load(f)
    if magic != 0x1950A86A20F9469CFC6C:
        raise ValueError("not a legacy torch.save stream (bad magic)")
    _safe_pickle_load(f)  # protocol version
    _safe_pickle_load(f)  # sys info

    storages: dict[str, tuple] = {}  # key -> (dtype_spec, numel)
    order: list[str] = []
    # (view_handle, root_handle, element offset, element count): legacy
    # persistent ids may reference a VIEW into a root storage; the tensor's
    # own storage_offset is then view-relative, so applying it to the root
    # would silently load the wrong slice
    views: list[tuple[list, list, int, int]] = []

    def load_storage(key, dtype_spec, numel, view_metadata=None):
        skey = str(key)
        if skey not in storages:
            storages[skey] = [dtype_spec, numel, None]
            order.append(skey)
        handle = storages[skey]
        if view_metadata is not None:
            view_key, offset, view_numel = view_metadata[:3]
            vkey = str(view_key)
            if vkey not in storages:
                storages[vkey] = [dtype_spec, int(view_numel), None]
                views.append(
                    (storages[vkey], handle, int(offset), int(view_numel))
                )
            return storages[vkey]
        return handle

    class LegacyUnpickler(_TorchUnpickler):
        def persistent_load(self, pid):
            if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
                raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
            storage_type, root_key, _location, numel = pid[1:5]
            view_metadata = pid[5] if len(pid) > 5 else None
            if isinstance(storage_type, _DTypeRef):
                dtype_spec = _DTYPE_NAMES[storage_type.name]
            else:
                dtype_spec = storage_type.dtype
            return load_storage(root_key, dtype_spec, numel, view_metadata)

    # tensors come back holding the mutable [dtype, numel, data] handles;
    # materialize() later walks the unpickled object tree and rebuilds them
    def deferred_rebuild(storage_handle, *args):
        return (storage_handle, args)

    class DeferredUnpickler(LegacyUnpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name in (
                "_rebuild_tensor_v2", "_rebuild_tensor"
            ):
                return deferred_rebuild
            return super().find_class(module, name)

    obj = DeferredUnpickler(f, None).load()
    key_order = _safe_pickle_load(f)  # serialized storage keys, write order
    for key in key_order:
        skey = str(key)
        (numel,) = struct.unpack("<q", f.read(8))
        dtype_spec = storages[skey][0]
        dt = _np_dtype(dtype_spec)
        if dt is None:
            raw = f.read(numel * 2)
            arr = _bf16_to_f32(np.frombuffer(raw, dtype=np.uint16))
        else:
            raw = f.read(numel * dt.itemsize)
            arr = np.frombuffer(raw, dtype=dt)
        storages[skey][2] = arr
    for vh, root, offset, vnumel in views:
        if root[2] is not None:
            vh[2] = root[2][offset : offset + vnumel]

    def materialize(x):
        if isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], list) \
                and len(x[0]) == 3:
            handle, args = x
            if handle[2] is not None:
                arr = handle[2]
                return _rebuild_tensor_v2((arr, arr.dtype.itemsize), *args)
        if isinstance(x, dict):
            return type(x)((k, materialize(v)) for k, v in x.items())
        if isinstance(x, list):
            return [materialize(v) for v in x]
        if isinstance(x, tuple):
            return tuple(materialize(v) for v in x)
        return x

    return materialize(obj)


def load_torch_checkpoint(path: str) -> Any:
    """Read a torch.save file (zip or legacy stream) without torch; tensors
    become numpy arrays, unknown objects become inert placeholders."""
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            return _read_zip(zf)
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        if head[:1] != b"\x80":
            raise ValueError(
                f"{path}: neither a torch zip checkpoint nor a pickle stream"
            )
        return _read_legacy(f)


def state_dict_arrays(obj: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a loaded checkpoint pytree to {dotted_name: ndarray}, skipping
    non-array leaves (ints, strs, placeholders)."""
    out: dict[str, np.ndarray] = {}

    def walk(x, pfx):
        if isinstance(x, np.ndarray):
            out[pfx.rstrip(".")] = x
            return
        if isinstance(x, dict):
            for k, v in x.items():
                walk(v, f"{pfx}{k}.")
            return
        if isinstance(x, (list, tuple)):
            for i, v in enumerate(x):
                walk(v, f"{pfx}{i}.")

    walk(obj, prefix)
    return out
