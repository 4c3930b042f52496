"""ctypes bindings for the native C++ batch loader (native/loader.cpp).

Builds the shared library on first use with g++ (cached beside the source);
falls back to a pure-numpy path if no compiler is available.  The native path
reads a whole batch of .npy timestep files with a C++ thread pool into ONE
preallocated buffer — a single jax.device_put away from HBM.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("msfno_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmsfno_loader.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "loader.cpp"))

_lib = None
_lock = threading.Lock()


def _build() -> str | None:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC_PATH
    ):
        return _LIB_PATH
    try:
        # build to a private temp name, then atomically publish: a second
        # process whose mtime check passes must never CDLL a half-written .so
        tmp = f"{_LIB_PATH}.build{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp,
             _SRC_PATH, "-lpthread"],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except Exception as e:  # no compiler / failure -> python fallback
        log.warning("native loader build failed (%s); using numpy fallback", e)
        return None


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        path = _build()
        if path is None:
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:  # stale/corrupt .so — honor the numpy fallback
            log.warning(
                "native loader .so unloadable (%s); using numpy fallback", e
            )
            _lib = False
            return None
        lib.msfno_npy_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.msfno_npy_info.restype = ctypes.c_int
        lib.msfno_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.msfno_load_npy_batch.restype = ctypes.c_int
        _lib = lib
        return lib


def npy_info(path: str) -> tuple[tuple[int, ...], int]:
    """(shape, word_size) without loading data."""
    lib = get_lib()
    if lib is None:
        with open(path, "rb") as f:
            ver = np.lib.format.read_magic(f)
            shape, _, dtype = np.lib.format._read_array_header(f, ver)
        return shape, dtype.itemsize
    shape_buf = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    ws = ctypes.c_int()
    rc = lib.msfno_npy_info(path.encode(), shape_buf, ctypes.byref(ndim),
                            ctypes.byref(ws))
    if rc != 0:
        raise IOError(f"msfno_npy_info({path}) failed: {rc}")
    return tuple(shape_buf[: ndim.value]), ws.value


def load_npy_batch(
    paths: list[str], item_shape: tuple[int, ...], n_threads: int = 8,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Read len(paths) .npy files into one (N, *item_shape) fp32 array."""
    n = len(paths)
    per_item = int(np.prod(item_shape))
    if out is None:
        out = np.empty((n, *item_shape), dtype=np.float32)
    assert out.size == n * per_item and out.dtype == np.float32
    lib = get_lib()
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = np.load(p).astype(np.float32).reshape(item_shape)
        return out
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.msfno_load_npy_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        per_item, n_threads,
    )
    if rc != 0:
        raise IOError(f"native batch load failed on file index {-rc - 1}: "
                      f"{paths[-rc - 1]}")
    return out


class NativeNpyBackend:
    """Drop-in replacement for era5.NpyBackend backed by the C++ reader."""

    def __init__(self, root: str, n_threads: int = 8):
        self.root = root
        self.n_threads = n_threads
        files = sorted(f for f in os.listdir(root) if f.startswith("era5_"))
        self.n = len(files)
        if self.n == 0:
            raise FileNotFoundError(f"no era5_*.npy files under {root}")
        self.item_shape, _ = npy_info(os.path.join(root, files[0]))
        self.has_sst = os.path.exists(os.path.join(root, "sst_000000.npy"))
        if self.has_sst:
            self.sst_shape, _ = npy_info(os.path.join(root, "sst_000000.npy"))

    def __len__(self):
        return self.n

    def _path(self, kind: str, idx: int) -> str:
        return os.path.join(self.root, f"{kind}_{idx:06d}.npy")

    def era5(self, idx: int) -> np.ndarray:
        return load_npy_batch([self._path("era5", idx)], self.item_shape,
                              self.n_threads)[0]

    def era5_batch(self, idcs: list[int]) -> np.ndarray:
        return load_npy_batch([self._path("era5", i) for i in idcs],
                              self.item_shape, self.n_threads)

    def sst(self, idx: int) -> np.ndarray | None:
        if not self.has_sst:
            return None
        return load_npy_batch([self._path("sst", idx)], self.sst_shape,
                              self.n_threads)[0]

    def sst_batch(self, idcs: list[int]) -> np.ndarray | None:
        if not self.has_sst:
            return None
        return load_npy_batch([self._path("sst", i) for i in idcs],
                              self.sst_shape, self.n_threads)
