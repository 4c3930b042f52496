"""ERA5 dataset (reference ERA5_galvani, MSFNO/Models/data.py:21-231).

The reference reads weatherbench2 ERA5 zarr (+ separate u100/v100 stores, a
CDS relative-humidity zarr, and a 1-degree SST zarr) via xarray with CPU
DataLoader workers.  This framework keeps the same semantics behind a
pluggable backend:

- ZarrBackend: same stores, gated on xarray/zarr availability (absent in
  this image — importing it raises a clear error until the libs exist);
- NpyBackend: a directory tree of per-timestep .npy files, suitable for the
  zero-dependency case and for the native C++ reader
  (msfno_tpu/data/native_loader.py);
- channel assembly is a pure function shared by all backends, reproducing
  the reference recipe exactly (data.py:161-196):
    vstack(scf[:2], u100, v100, scf[2:], pl at reversed levels, r).

Time index semantics: 6h steps since the dataset start, leap-year aware
(data.py:138-151); per-sample output is S = multi_step + 2 consecutive
states plus an SST history window per step (coarsened 4x, data.py:198-213).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from calendar import isleap
from typing import Iterator, Sequence

import numpy as np

from msfno_tpu.data.sst import coarsen
from msfno_tpu.data.synthetic import Batch

STEPS_PER_DAY = 4  # 6-hourly


def zarr_level_order() -> list[int]:
    """Pressure-level selection order for zarr reads: ascending 50..1000.

    The reference's `param_level_pl[1]` is descending 1000..50
    (sfno/model.py:54-57) and is reversed before `.sel(level=...)`
    (data.py:157-158), so the assembled channels run u50..u1000 — matching
    the pretrained checkpoint ordering (model.py:62-136) and
    variables.ORDERING.  Importable without xarray so it stays testable."""
    from msfno_tpu.models.variables import PL_LEVELS

    return sorted(PL_LEVELS)


def year_range_indices(dataset_start_year: int, start_year: int, end_year: int):
    """(start_idx, end_idx) in 6h steps from the dataset start
    (reference data.py:138-151)."""
    start_idx = STEPS_PER_DAY * sum(
        366 if isleap(y) else 365 for y in range(dataset_start_year, start_year)
    )
    end_idx = (
        STEPS_PER_DAY
        * sum(366 if isleap(y) else 365 for y in range(dataset_start_year, end_year))
        - 1
    )
    return start_idx, end_idx


def index_to_yyyymmddhh(dataset_start_year: int, idx: int) -> int:
    """6h-step index -> YYYYMMDDHH int, the reference's time format
    (data.py:162-163)."""
    from datetime import datetime, timedelta

    t = datetime(dataset_start_year, 1, 1) + timedelta(hours=6 * idx)
    return t.year * 1000000 + t.month * 10000 + t.day * 100 + t.hour


def yyyymmddhh_to_index(dataset_start_year: int, t: int) -> int:
    """Inverse of index_to_yyyymmddhh: a YYYYMMDDHH valid time -> 6h-step
    index from the dataset start (hours are floored to the 6h grid)."""
    from datetime import datetime

    y, mo, d, h = t // 10**6, t // 10**4 % 100, t // 100 % 100, t % 100
    dt = datetime(y, mo, d, (h // 6) * 6) - datetime(dataset_start_year, 1, 1)
    return int(dt.total_seconds()) // (6 * 3600)


def rollout_sst_window_start(
    base: int, step: int, temporal_step: int, past_sst: bool
) -> int:
    """SST window start fed at autoregressive rollout step `step` from the
    initial-condition index `base` — the TRAINING convention, so inference
    conditioning matches fine-tuning exactly: trainer._rollout_loss feeds
    window index step+1 of ERA5Dataset's per-sample windows, i.e.
    ERA5Dataset._sst_window_start(base, step + 1) (reference
    data.py:204-211,227 with train.py model_forward's data[step+1][1]).

    past_sst=False: [base+step+1, base+step+1+T) — starts at the forecast
    valid time; past_sst=True: [base+step-T, base+step) — strictly past."""
    return base + step + 1 - (temporal_step + 1 if past_sst else 0)


def assemble_channels(
    scf: np.ndarray,
    u100: np.ndarray,
    v100: np.ndarray,
    pl: np.ndarray,
    r: np.ndarray | None = None,
) -> np.ndarray:
    """73-channel assembly (reference data.py:161-196), channels-last output.

    scf:  (6, H, W) surface fields in ERA5 order (10u, 10v, 2t, sp, msl, tcwv)
    u100/v100: (H, W)
    pl:   (4 or 5, 13, H, W) pressure-level fields (u, v, z, t[, r]) with
          levels ascending 50..1000: the reference's `param_level_pl[1]` is
          descending 1000..50 and is reversed before the .sel
          (data.py:157-158 with sfno/model.py:54-57), matching the
          checkpoint channel ordering u50..u1000 (model.py:62-136) and
          variables.ORDERING
    r:    (13, H, W) relative humidity when not folded into pl
    Returns (H, W, 73).
    """
    parts = [scf[:2], u100[None], v100[None], scf[2:]]
    pl_flat = pl.reshape(pl.shape[0] * pl.shape[1], *pl.shape[2:])
    parts.append(pl_flat)
    if r is not None:
        parts.append(r)
    stacked = np.vstack(parts)
    if stacked.shape[0] != 73:
        raise ValueError(f"expected 73 channels, got {stacked.shape[0]}")
    return np.ascontiguousarray(np.moveaxis(stacked, 0, -1), dtype=np.float32)


class NpyBackend:
    """Directory of per-timestep arrays: {root}/era5_{idx:06d}.npy holding
    (H, W, 73) channels-last states and optionally {root}/sst_{idx:06d}.npy
    (Hs, Ws) SST with NaN over land."""

    def __init__(self, root: str):
        import re

        self.root = root
        # exact frame files only, contiguity checked at construction: a
        # stray era5_stats.npy or a hole in the numbering would otherwise
        # surface as a FileNotFoundError deep inside a loader worker
        idcs = sorted(
            int(m.group(1))
            for f in os.listdir(root)
            if (m := re.fullmatch(r"era5_(\d{6})\.npy", f))
        )
        self.n = len(idcs)
        if self.n == 0:
            raise FileNotFoundError(f"no era5_*.npy files under {root}")
        if idcs != list(range(self.n)):
            missing = sorted(set(range(idcs[-1] + 1)) - set(idcs))
            raise FileNotFoundError(
                f"era5_*.npy must be numbered 0..{self.n - 1} under {root}; "
                f"missing {missing[:5]}{'...' if len(missing) > 5 else ''}"
            )
        self.has_sst = os.path.exists(os.path.join(root, "sst_000000.npy"))

    def __len__(self):
        return self.n

    def era5(self, idx: int) -> np.ndarray:
        return np.load(os.path.join(self.root, f"era5_{idx:06d}.npy"))

    def sst(self, idx: int) -> np.ndarray | None:
        if not self.has_sst:
            return None
        return np.load(os.path.join(self.root, f"sst_{idx:06d}.npy"))

    # ---- bulk reads (C++ thread-pool reader, numpy fallback) ----
    # ERA5Dataset.get_batch / PrefetchLoader take this path when present:
    # one call reads all B*S step files into ONE preallocated fp32 buffer
    # (native/loader.cpp), instead of np.load-per-file in Python threads.
    # Only fp32 stores (the production layout; tools/make_npy_store.py)
    # qualify — a store with any other dtype falls back to per-file
    # np.load, preserving its dtype bit-exactly rather than silently
    # casting through the fp32 buffer.
    def _shape(self, kind: str) -> tuple[int, ...] | None:
        cache = getattr(self, "_shapes", None)
        if cache is None:
            cache = self._shapes = {}
        if kind not in cache:
            from msfno_tpu.data.native_loader import npy_info

            shape, word_size = npy_info(
                os.path.join(self.root, f"{kind}_000000.npy")
            )
            first = np.load(os.path.join(self.root, f"{kind}_000000.npy"),
                            mmap_mode="r")
            cache[kind] = (
                shape if first.dtype == np.float32 and word_size == 4
                else None
            )
        return cache[kind]

    def era5_batch(self, idcs) -> np.ndarray:
        shape = self._shape("era5")
        if shape is None:  # non-fp32 store: exact per-file path
            return np.stack([self.era5(i) for i in idcs])
        from msfno_tpu.data.native_loader import load_npy_batch

        return load_npy_batch(
            [os.path.join(self.root, f"era5_{i:06d}.npy") for i in idcs],
            shape,
        )

    def sst_batch(self, idcs) -> np.ndarray | None:
        if not self.has_sst:
            return None
        shape = self._shape("sst")
        if shape is None:
            return np.stack([self.sst(i) for i in idcs])
        from msfno_tpu.data.native_loader import load_npy_batch

        return load_npy_batch(
            [os.path.join(self.root, f"sst_{i:06d}.npy") for i in idcs],
            shape,
        )


class ZarrBackend:
    """weatherbench2-layout zarr stores (reference data.py:86-104).

    xarray/zarr are absent from this image; runtime coverage comes from the
    stubbed-xarray harness in tests/test_zarr_backend.py (synthetic in-memory
    WB2-layout datasets), which pins level re-sort, the rh offset derivation,
    rh level re-sort/name fallback, and SST coarsening against NpyBackend."""

    def __init__(self, path: str, u100_path: str | None = None,
                 v100_path: str | None = None, sst_path: str | None = None,
                 rh_path: str | None = None, coarse_level: int = 4):
        try:
            import xarray as xr
        except ImportError as e:
            raise ImportError(
                "ZarrBackend needs xarray/zarr; use NpyBackend in this image"
            ) from e
        from msfno_tpu.models.variables import ERA5_PL_NAMES, ERA5_SFC_NAMES

        self._xr = xr
        self.ds = xr.open_zarr(path, chunks=None)
        self.ds_u100 = xr.open_zarr(u100_path, chunks=None) if u100_path else None
        self.ds_v100 = xr.open_zarr(v100_path, chunks=None) if v100_path else None
        self.ds_sst = xr.open_zarr(sst_path, chunks=None) if sst_path else None
        self.ds_rh = xr.open_zarr(rh_path, chunks=None) if rh_path else None
        # the CDS rh store starts decades after the WB2 ERA5 store; the
        # reference hard-codes dataset_idx_offset=29220 (1959->1979 in 6h
        # steps, data.py:176).  Derived from the time axes instead: same
        # number for those stores, correct for any others.
        self.rh_offset = 0
        if self.ds_rh is not None:
            import numpy as _np

            dt = _np.datetime64(self.ds_rh.time.values[0]) - _np.datetime64(
                self.ds.time.values[0]
            )
            self.rh_offset = int(dt / _np.timedelta64(6, "h"))
        self.coarse_level = coarse_level
        self.sfc_names = [ERA5_SFC_NAMES[k] for k in
                          ("10u", "10v", "2t", "sp", "msl", "tcwv")]
        self.pl_names = [ERA5_PL_NAMES[k] for k in ("u", "v", "z", "t")]
        self.rh_name = ERA5_PL_NAMES["r"]
        self.levels = zarr_level_order()
        self.n = self.ds.sizes["time"]

    def __len__(self):
        return self.n

    def era5(self, idx: int) -> np.ndarray:
        s = self.ds.isel(time=idx)
        scf = s[self.sfc_names].to_array().to_numpy()
        u100 = self.ds_u100.isel(time=idx)["u100"].to_numpy()
        v100 = self.ds_v100.isel(time=idx)["v100"].to_numpy()
        if self.ds_rh is not None:
            pl = s[self.pl_names].sel(level=self.levels).to_array().to_numpy()
            ridx = idx - self.rh_offset
            if ridx < 0:
                raise IndexError(
                    f"time index {idx} predates the rh store (offset "
                    f"{self.rh_offset} steps; reference data.py:176)"
                )
            rsel = self.ds_rh.isel(time=ridx)
            if "level" in self.ds_rh.coords:
                # the pl fields above are re-sorted ascending 50..1000; the
                # separate rh store must match or its 13 channels would be
                # silently scrambled against variables.ORDERING
                rsel = rsel.sel(level=self.levels)
            r = rsel[
                self.rh_name if self.rh_name in self.ds_rh.data_vars
                else list(self.ds_rh.data_vars)[0]
            ].to_numpy()
        else:
            pl = s[self.pl_names + [self.rh_name]].sel(
                level=self.levels
            ).to_array().to_numpy()
            r = None
        return assemble_channels(scf, u100, v100, pl, r)

    def sst(self, idx: int) -> np.ndarray:
        src = self.ds_sst if self.ds_sst is not None else self.ds
        sst = src.isel(time=idx)["sea_surface_temperature"].to_numpy()
        if self.ds_sst is None:
            sst = coarsen(sst, self.coarse_level)
        return sst


@dataclasses.dataclass
class ERA5Dataset:
    """Multi-step sample assembly over a backend (reference __getitem__,
    data.py:156-231): index i yields S = multi_step + 2 consecutive 6h states
    plus a temporal_step-long SST window per step.

    SST window semantics replicate the reference's get_sst + per-step slice
    `sst[i:i+temporal_step]` (data.py:204-211, 227) exactly:
    - past_sst=False (reference constructor default): the global window
      starts at the sample's first state, so step i's window covers
      [base+i, base+i+T) — the step's own time and T-1 steps into the future;
    - past_sst=True: the global window starts T+1 steps earlier, so step i's
      window covers [base+i-T-1, base+i-1) — strictly past SST ending two
      steps before the step's time.
    """

    backend: object
    multi_step: int = 0
    temporal_step: int = 28
    with_sst: bool = True
    past_sst: bool = False
    start_idx: int = 0
    end_idx: int | None = None
    # when set, per-step times are YYYYMMDDHH ints derived from the 6h index
    # (reference format(), data.py:162-163: int(YYYY+MM+DD+HH))
    dataset_start_year: int | None = None

    def __post_init__(self):
        n = len(self.backend)
        s = self.multi_step + 2
        sst_active = self.with_sst and getattr(self.backend, "has_sst", True)
        if sst_active and self.past_sst:
            self._pad_past, future_needed = self.temporal_step + 1, s
        elif sst_active:
            self._pad_past, future_needed = 0, max(s, s - 1 + self.temporal_step)
        else:
            self._pad_past, future_needed = 0, s
        last_needed = self._pad_past + future_needed
        end = n if self.end_idx is None else self.end_idx  # 0 is explicit
        self.end_idx = min(end, n) - last_needed
        if self.end_idx <= self.start_idx:
            raise ValueError("dataset too short for the requested windows")

    def __len__(self):
        return self.end_idx - self.start_idx

    def _sst_window_start(self, base: int, i: int) -> int:
        # reference: global slice start idx (past: idx-T-1) + per-step offset i
        return base + i - (self.temporal_step + 1 if self.past_sst else 0)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray | None, np.ndarray]:
        """Returns (era5 (S, H, W, C), sst (S, T, Hs, Ws) | None, times (S,))."""
        base = self.start_idx + idx + self._pad_past
        s = self.multi_step + 2
        era5 = np.stack([self.backend.era5(base + i) for i in range(s)])
        sst = None
        if self.with_sst and getattr(self.backend, "has_sst", True):
            windows = []
            for i in range(s):
                w0 = self._sst_window_start(base, i)
                w = [self.backend.sst(w0 + t) for t in range(self.temporal_step)]
                if w[0] is None:
                    sst = None
                    break
                windows.append(np.stack(w))
            else:
                sst = np.stack(windows)
        if self.dataset_start_year is not None:
            times = np.asarray(
                [
                    index_to_yyyymmddhh(self.dataset_start_year, base + i)
                    for i in range(s)
                ],
                dtype=np.int64,
            )
        else:
            times = np.zeros(s, dtype=np.int64)
        return era5, sst, times

    def get_batch(self, idcs: Sequence[int]):
        """Assemble a whole batch in bulk: one backend batch-read for all
        B*S era5 states and one for the UNIQUE SST timesteps (windows of
        adjacent steps overlap almost completely), exploiting the native C++
        reader's single-call thread pool when the backend provides
        era5_batch/sst_batch.  Returns a Batch with era5 (S, B, H, W, C)."""
        from msfno_tpu.data.synthetic import Batch

        s = self.multi_step + 2
        bases = [self.start_idx + int(i) + self._pad_past for i in idcs]
        flat = [b + j for b in bases for j in range(s)]  # (B*S) order
        if hasattr(self.backend, "era5_batch"):
            era5_bs = self.backend.era5_batch(flat)
        else:
            era5_bs = np.stack([self.backend.era5(i) for i in flat])
        era5 = np.ascontiguousarray(
            era5_bs.reshape(len(bases), s, *era5_bs.shape[1:]).swapaxes(0, 1)
        )
        sst = None
        if self.with_sst and getattr(self.backend, "has_sst", True):
            t = self.temporal_step
            needed = sorted(
                {
                    self._sst_window_start(b, j) + k
                    for b in bases
                    for j in range(s)
                    for k in range(t)
                }
            )
            if hasattr(self.backend, "sst_batch"):
                loaded = self.backend.sst_batch(needed)
            else:
                fields = [self.backend.sst(i) for i in needed]
                loaded = np.stack(fields) if fields[0] is not None else None
            if loaded is not None:
                pos = {idx: n for n, idx in enumerate(needed)}
                gather = np.asarray(
                    [
                        [
                            [pos[self._sst_window_start(b, j) + k] for k in range(t)]
                            for b in bases
                        ]
                        for j in range(s)
                    ]
                )
                sst = loaded[gather]  # (S, B, T, Hs, Ws)
        if self.dataset_start_year is not None:
            times = np.asarray(
                [
                    [index_to_yyyymmddhh(self.dataset_start_year, b + j) for b in bases]
                    for j in range(s)
                ],
                dtype=np.int64,
            )
        else:
            times = np.zeros((s, len(bases)), dtype=np.int64)
        return Batch(era5=era5, sst=sst, times=times)


class PrefetchLoader:
    """Threaded batch loader (replaces the reference's torch DataLoader CPU
    worker processes, train.py:513-519).  Assembles Batch objects on
    background threads and prefetches `prefetch` batches ahead."""

    def __init__(self, dataset: ERA5Dataset, batch_size: int = 1,
                 shuffle: bool = False, seed: int = 0, num_workers: int = 2,
                 prefetch: int = 2, drop_last: bool = True,
                 shard_id: int | None = None, num_shards: int | None = None,
                 transfer_dtype=None):
        """shard_id/num_shards: multi-host data sharding — each host reads a
        disjoint, per-epoch-reshuffled subset (the reference's
        DistributedSampler, train.py:513-515).  Default to this process's
        position in the jax cluster; pass 0/1 to disable.

        transfer_dtype: cast era5/SST float fields to this dtype (e.g.
        jnp.bfloat16) inside the WORKER threads, halving host->device
        transfer bytes at zero main-loop cost (the cast overlaps compute).
        ~0.4% relative input error on normalized fields — an explicit
        numerics opt-in for transfer-bandwidth-bound pipelines."""
        self.dataset = dataset
        self.transfer_dtype = transfer_dtype
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        if num_shards is None:
            # Default to this process's slot in an ALREADY-initialized jax
            # cluster.  Never trigger backend init from here: process_index()
            # on a cold process would bring up the (possibly remote-tunnel)
            # default backend just to learn the shard id — and a wedged
            # tunnel blocks that call forever.  Single-process (the only
            # case where nothing initialized jax first) is shard 0 of 1.
            shard_id, num_shards = 0, 1
            try:
                import jax._src.xla_bridge as xb

                backend_live = bool(xb._backends)
            except Exception:
                backend_live = False
            if backend_live:
                import jax

                try:
                    shard_id = jax.process_index()
                    num_shards = jax.process_count()
                except RuntimeError:
                    pass
        self.shard_id = shard_id or 0
        self.num_shards = max(num_shards or 1, 1)

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        nb = n // self.batch_size
        return nb if self.drop_last else -(-n // self.batch_size)

    def _order(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # per-epoch deterministic reshuffle (sampler.set_epoch analogue,
            # train.py:303-304); same permutation on every host, then each
            # host takes a strided disjoint subset (DistributedSampler)
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        if self.num_shards > 1:
            per = len(idx) // self.num_shards
            idx = idx[self.shard_id::self.num_shards][:per]
        return idx

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        order = self._order(epoch)
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def make_batch(b: int) -> Batch:
            # final batch may be partial when drop_last=False
            lo = b * self.batch_size
            idcs = [int(i) for i in
                    order[lo : lo + self.batch_size]]
            if hasattr(self.dataset, "get_batch"):
                # bulk path: one (native) batch read for era5 + deduped SST
                batch = self.dataset.get_batch(idcs)
            else:
                items = [self.dataset[i] for i in idcs]
                era5 = np.stack([it[0] for it in items], axis=1)  # (S,B,H,W,C)
                sst = None
                if items[0][1] is not None:
                    sst = np.stack([it[1] for it in items], axis=1)
                times = np.stack([it[2] for it in items], axis=1)
                batch = Batch(era5=era5, sst=sst, times=times)
            if self.transfer_dtype is not None:
                batch = Batch(
                    era5=batch.era5.astype(self.transfer_dtype),
                    sst=(batch.sst.astype(self.transfer_dtype)
                         if batch.sst is not None else None),
                    times=batch.times,
                )
            return batch

        def put_or_stop(item) -> bool:
            """Bounded put that re-checks stop: a plain q.put on the full
            queue would block FOREVER once the consumer abandons the
            generator (islice'd validation loaders do every pass), leaking
            one thread + one multi-GB assembled Batch per worker per epoch."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker(worker_id: int):
            for b in range(worker_id, nb, self.num_workers):
                if stop.is_set():
                    return
                try:
                    batch = make_batch(b)
                except Exception as e:  # propagate: a swallowed worker
                    # error would leave the consumer blocked on q.get()
                    # forever (received < nb never resolves)
                    put_or_stop((-1, e))
                    return
                if not put_or_stop((b, batch)):
                    return

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            pending: dict[int, Batch] = {}
            nxt = 0
            received = 0
            while nxt < nb:
                while nxt not in pending and received < nb:
                    b, batch = q.get()
                    if b < 0:
                        raise RuntimeError(
                            "PrefetchLoader worker failed"
                        ) from batch
                    pending[b] = batch
                    received += 1
                yield pending.pop(nxt)
                nxt += 1
        finally:
            stop.set()
            # workers blocked in put_or_stop notice stop within its timeout;
            # join then drain so no Batch stays pinned in the dead queue.
            # When an abandoned generator is finalized at interpreter exit,
            # threading/queue module internals may already be torn down —
            # swallow errors ONLY in that teardown case (sys.is_finalizing);
            # a normal mid-run close re-raises real failures.
            try:
                for t in threads:
                    t.join(timeout=5.0)
                while not q.empty():
                    q.get_nowait()
            except Exception:
                import sys

                if not sys.is_finalizing():
                    raise
