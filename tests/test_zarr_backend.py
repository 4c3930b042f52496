"""ZarrBackend end-to-end coverage via a stubbed xarray (VERDICT r2 item 4).

The image has no xarray/zarr, so `ZarrBackend` (msfno_tpu/data/era5.py) would
otherwise be import-gated dead code.  Same pattern as tests/ref_compat's
torch_harmonics stub: a minimal fake `xarray` module is injected into
sys.modules, backed by in-memory synthetic weatherbench2-layout datasets, and
the backend's channel assembly is pinned against NpyBackend / direct
assemble_channels outputs.

Pins (reference MSFNO/Models/data.py:86-104,157-176):
- pressure-level re-sort to ascending 50..1000 regardless of store order
- the rh time-offset derivation from the two stores' time axes (the
  reference hard-codes 29220 steps, data.py:176)
- rh level re-sort when the rh store carries a level coordinate
- rh variable-name fallback when the store's var isn't the canonical name
- SST 4x-coarsen when SST lives in the main store vs pass-through from a
  separate pre-coarsened store (data.py:198-213)
"""

import sys
import types

import numpy as np
import pytest

from msfno_tpu.data.era5 import (
    ERA5Dataset,
    NpyBackend,
    PrefetchLoader,
    ZarrBackend,
    assemble_channels,
    zarr_level_order,
)
from msfno_tpu.data.sst import coarsen
from msfno_tpu.models.variables import ERA5_PL_NAMES, ERA5_SFC_NAMES, PL_LEVELS

H, W = 8, 16
NT = 12  # main-store timesteps
RH_LAG_STEPS = 4  # rh store starts 1 day later


# --------------------------------------------------------------- fake xarray


class FakeVar:
    def __init__(self, arr):
        self._arr = np.asarray(arr)

    def to_numpy(self):
        return self._arr


class FakeDataset:
    """The slice of the xarray.Dataset API ZarrBackend touches: open_zarr,
    .time.values, .sizes, .coords, .data_vars, isel(time=), sel(level=),
    [name] / [list-of-names], .to_array()."""

    def __init__(self, variables, coords):
        # variables: name -> (dims tuple, ndarray); coords: name -> ndarray
        self._vars = dict(variables)
        self.coords = dict(coords)

    @property
    def time(self):
        return types.SimpleNamespace(values=self.coords["time"])

    @property
    def sizes(self):
        return {"time": len(self.coords["time"])}

    @property
    def data_vars(self):
        return {k: v for k, (_, v) in self._vars.items()}

    def isel(self, time):
        out = {}
        for name, (dims, arr) in self._vars.items():
            assert dims[0] == "time"
            out[name] = (dims[1:], arr[time])
        coords = {k: v for k, v in self.coords.items() if k != "time"}
        return FakeDataset(out, coords)

    def sel(self, level):
        stored = list(self.coords["level"])
        take = [stored.index(l) for l in level]
        out = {}
        for name, (dims, arr) in self._vars.items():
            ax = dims.index("level")
            out[name] = (dims, np.take(arr, take, axis=ax))
        coords = dict(self.coords)
        coords["level"] = np.asarray(level)
        return FakeDataset(out, coords)

    def __getitem__(self, key):
        if isinstance(key, str):
            return FakeVar(self._vars[key][1])
        return FakeDataset({k: self._vars[k] for k in key}, self.coords)

    def to_array(self):
        return FakeVar(np.stack([arr for _, arr in self._vars.values()]))


def _times(start: str, n: int) -> np.ndarray:
    t0 = np.datetime64(start)
    return t0 + np.arange(n) * np.timedelta64(6, "h")


@pytest.fixture
def stores(monkeypatch):
    """Synthetic WB2-layout stores behind a fake `xarray.open_zarr`."""
    rng = np.random.default_rng(7)
    levels_desc = sorted(PL_LEVELS, reverse=True)  # stored 1000..50

    sfc_names = [
        ERA5_SFC_NAMES[k] for k in ("10u", "10v", "2t", "sp", "msl", "tcwv")
    ]
    main_vars = {
        n: (("time", "lat", "lon"), rng.standard_normal((NT, H, W)))
        for n in sfc_names
    }
    for k in ("u", "v", "z", "t"):
        main_vars[ERA5_PL_NAMES[k]] = (
            ("time", "level", "lat", "lon"),
            rng.standard_normal((NT, 13, H, W)),
        )
    sst_full = rng.standard_normal((NT, H, W))
    sst_full[:, :2, :3] = np.nan  # land
    main_vars["sea_surface_temperature"] = (("time", "lat", "lon"), sst_full)
    main = FakeDataset(
        main_vars,
        {"time": _times("1959-01-01", NT), "level": np.asarray(levels_desc)},
    )

    u100 = FakeDataset(
        {"u100": (("time", "lat", "lon"), rng.standard_normal((NT, H, W)))},
        {"time": _times("1959-01-01", NT)},
    )
    v100 = FakeDataset(
        {"v100": (("time", "lat", "lon"), rng.standard_normal((NT, H, W)))},
        {"time": _times("1959-01-01", NT)},
    )
    # rh store: starts RH_LAG_STEPS later, nonstandard var name, and its own
    # (descending) level coordinate -> exercises offset + fallback + re-sort
    nrh = NT - RH_LAG_STEPS
    rh = FakeDataset(
        {"r": (("time", "level", "lat", "lon"),
               rng.standard_normal((nrh, 13, H, W)))},
        {"time": _times("1959-01-02", nrh), "level": np.asarray(levels_desc)},
    )
    # separate pre-coarsened SST store (coarse factor 2 -> 4x8)
    sst_sep = FakeDataset(
        {"sea_surface_temperature": (
            ("time", "lat", "lon"), rng.standard_normal((NT, H // 2, W // 2)))},
        {"time": _times("1959-01-01", NT)},
    )

    registry = {
        "main.zarr": main, "u100.zarr": u100, "v100.zarr": v100,
        "rh.zarr": rh, "sst.zarr": sst_sep,
    }
    fake = types.ModuleType("xarray")
    fake.open_zarr = lambda path, chunks=None: registry[path]
    monkeypatch.setitem(sys.modules, "xarray", fake)
    return registry


def _expected_era5(stores, idx):
    """Assemble the 73-ch state directly from the raw store arrays."""
    main = stores["main.zarr"]
    levels_asc = zarr_level_order()
    stored = list(main.coords["level"])
    take = [stored.index(l) for l in levels_asc]
    scf = np.stack(
        [main._vars[ERA5_SFC_NAMES[k]][1][idx]
         for k in ("10u", "10v", "2t", "sp", "msl", "tcwv")]
    )
    pl = np.stack(
        [main._vars[ERA5_PL_NAMES[k]][1][idx][take] for k in ("u", "v", "z", "t")]
    )
    r = stores["rh.zarr"]._vars["r"][1][idx - RH_LAG_STEPS][take]
    return assemble_channels(
        scf,
        stores["u100.zarr"]._vars["u100"][1][idx],
        stores["v100.zarr"]._vars["v100"][1][idx],
        pl,
        r,
    )


class TestZarrBackend:
    def test_level_resort_and_rh_offset(self, stores):
        be = ZarrBackend(
            "main.zarr", u100_path="u100.zarr", v100_path="v100.zarr",
            sst_path="sst.zarr", rh_path="rh.zarr",
        )
        assert len(be) == NT
        # offset derived from the time axes: 1 day = 4 six-hour steps
        # (the reference hard-codes its stores' 29220, data.py:176)
        assert be.rh_offset == RH_LAG_STEPS
        for idx in (RH_LAG_STEPS, NT - 1):
            np.testing.assert_array_equal(be.era5(idx), _expected_era5(stores, idx))

    def test_rh_predate_raises(self, stores):
        be = ZarrBackend("main.zarr", u100_path="u100.zarr",
                         v100_path="v100.zarr", rh_path="rh.zarr")
        with pytest.raises(IndexError, match="predates the rh store"):
            be.era5(RH_LAG_STEPS - 1)

    def test_rh_folded_into_main_store(self, stores):
        """No separate rh store: r is read from the main store's pl group."""
        main = stores["main.zarr"]
        rng = np.random.default_rng(11)
        main._vars[ERA5_PL_NAMES["r"]] = (
            ("time", "level", "lat", "lon"),
            rng.standard_normal((NT, 13, H, W)),
        )
        be = ZarrBackend("main.zarr", u100_path="u100.zarr",
                         v100_path="v100.zarr")
        got = be.era5(3)
        stored = list(main.coords["level"])
        take = [stored.index(l) for l in zarr_level_order()]
        r = main._vars[ERA5_PL_NAMES["r"]][1][3][take]
        # last 13 channels are relative humidity at ascending levels
        np.testing.assert_array_equal(
            got[..., 60:], np.moveaxis(r, 0, -1).astype(np.float32)
        )
        del main._vars[ERA5_PL_NAMES["r"]]

    def test_sst_separate_store_passthrough(self, stores):
        be = ZarrBackend("main.zarr", u100_path="u100.zarr",
                         v100_path="v100.zarr", sst_path="sst.zarr",
                         rh_path="rh.zarr")
        np.testing.assert_array_equal(
            be.sst(5),
            stores["sst.zarr"]._vars["sea_surface_temperature"][1][5],
        )

    def test_sst_main_store_coarsened(self, stores):
        be = ZarrBackend("main.zarr", u100_path="u100.zarr",
                         v100_path="v100.zarr", rh_path="rh.zarr",
                         coarse_level=2)
        expect = coarsen(
            stores["main.zarr"]._vars["sea_surface_temperature"][1][5], 2
        )
        np.testing.assert_array_equal(be.sst(5), expect)

    def test_dataset_and_loader_match_npy_backend(self, stores, tmp_path):
        """End-to-end: ERA5Dataset + PrefetchLoader over ZarrBackend produce
        the same batches as over an NpyBackend holding the same fields."""
        be = ZarrBackend(
            "main.zarr", u100_path="u100.zarr", v100_path="v100.zarr",
            sst_path="sst.zarr", rh_path="rh.zarr",
        )
        # mirror the zarr-backed frames into an npy store (from the rh
        # offset on, where the zarr store is fully defined)
        base = RH_LAG_STEPS
        n = NT - base
        for i in range(n):
            np.save(tmp_path / f"era5_{i:06d}.npy", be.era5(base + i))
            np.save(tmp_path / f"sst_{i:06d}.npy", be.sst(base + i))
        npy = NpyBackend(str(tmp_path))

        kw = dict(multi_step=1, temporal_step=2, with_sst=True)
        ds_z = ERA5Dataset(backend=be, start_idx=base, **kw)
        ds_n = ERA5Dataset(backend=npy, **kw)
        assert len(ds_z) >= len(ds_n) - 1  # zarr store extends past base
        b_z = list(PrefetchLoader(ds_z, batch_size=2, num_shards=1).epoch(0))
        b_n = list(PrefetchLoader(ds_n, batch_size=2, num_shards=1).epoch(0))
        for bz, bn in zip(b_z, b_n):
            np.testing.assert_array_equal(bz.era5, bn.era5)
            np.testing.assert_array_equal(bz.sst, bn.sst)
