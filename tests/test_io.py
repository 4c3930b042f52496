"""I/O registry and climatology tests."""

import json
import os

import numpy as np
import pytest

from msfno_tpu.data.climatology import build_climatology, climatology_at
from msfno_tpu.inference.io import (
    FileOutput,
    HindcastReLabel,
    available_inputs,
    available_outputs,
    get_input,
    get_output,
)


class TestInputs:
    def test_registry(self):
        assert set(available_inputs()) == {"mars", "cds", "file", "localsource", "none"}

    def test_file_input(self, tmp_path):
        arr = np.random.randn(4, 8, 3).astype(np.float32)
        p = str(tmp_path / "ic.npy")
        np.save(p, arr)
        src = get_input("file", file=p)
        out = src.all_fields()
        assert out.shape == (1, 4, 8, 3)

    def test_network_inputs_raise(self):
        with pytest.raises(RuntimeError, match="climetlab"):
            get_input("mars")

    def test_local_input(self, tmp_path):
        os.makedirs(tmp_path / "store")
        np.save(tmp_path / "store" / "era5_000000.npy",
                np.zeros((4, 8, 3), np.float32))
        src = get_input("localsource", path=str(tmp_path / "store"), time_index=0)
        assert src.all_fields().shape == (1, 4, 8, 3)


class TestOutputs:
    def test_registry(self):
        assert set(available_outputs()) == {"file", "netcdf", "none"}

    def test_file_output_with_variable_filter(self, tmp_path):
        out = FileOutput(
            path=str(tmp_path / "fc"),
            variables=["b"],
            ordering=["a", "b", "c"],
        )
        data = np.random.randn(1, 4, 8, 3).astype(np.float32)
        out.write(data, step=6)
        saved = np.load(tmp_path / "fc" / "step_0006.npy")
        np.testing.assert_array_equal(saved[..., 0], data[..., 1])
        manifest = json.loads((tmp_path / "fc" / "manifest.json").read_text())
        assert manifest["steps"] == [6]
        assert manifest["variables"] == ["b"]

    def test_hindcast_relabel(self, tmp_path):
        inner = FileOutput(path=str(tmp_path / "fc"))
        h = HindcastReLabel(None, inner, reference_date=20200101, hdate=20190101)
        h.write(np.zeros((1, 2, 2, 1)), step=6)
        assert os.path.exists(tmp_path / "fc" / "step_0006.npy")

    def test_none_output(self):
        get_output("none").write(np.zeros(3))


class _SyntheticBackend:
    """Deterministic 2-year 6-hourly archive: value = year marker."""

    def __init__(self, start_year=1979, years=2):
        from calendar import isleap

        self.days = [366 if isleap(start_year + i) else 365 for i in range(years)]
        self.n = 4 * sum(self.days)
        self.start_year = start_year

    def era5(self, idx):
        # year 0 -> 1.0, year 1 -> 3.0 (mean = 2.0)
        d = idx // 4
        year = 0 if d < self.days[0] else 1
        return np.full((2, 2, 1), 1.0 + 2.0 * year, np.float32)


class TestClimatology:
    def test_two_year_mean(self):
        b = _SyntheticBackend(1979, 2)
        clim = build_climatology(b, 1979, [1979, 1980])
        assert clim.shape == (365, 4, 2, 2, 1)
        np.testing.assert_allclose(clim, 2.0)

    def test_lookup_feb29(self):
        clim = np.arange(365 * 4, dtype=np.float32).reshape(365, 4, 1, 1, 1)
        # Feb 29 (doy 366 would overflow) maps within bounds
        v = climatology_at(clim, 366, 18)
        assert v.shape == (1, 1, 1)


class TestNetCDFOutput:
    def test_writes_real_netcdf(self, tmp_path):
        """Real NetCDF3 files readable by an independent reader
        (scipy.io.netcdf_file round-trip)."""
        from scipy.io import netcdf_file

        from msfno_tpu.inference.io import NetCDFOutput

        out = NetCDFOutput(
            path=str(tmp_path / "fc"),
            ordering=["t2m", "u10", "v10"],
            variables=["t2m", "v10"],
        )
        rng = np.random.default_rng(0)
        data = rng.standard_normal((1, 8, 16, 3)).astype(np.float32)
        path = out.write(data, step=6)
        with netcdf_file(path, "r") as nc:
            assert set(nc.variables) == {
                "latitude", "longitude", "step", "t2m", "v10"
            }
            assert nc.variables["step"][0] == 6
            np.testing.assert_allclose(
                nc.variables["t2m"][0], data[0, :, :, 0], rtol=1e-6
            )
            np.testing.assert_allclose(
                nc.variables["v10"][0], data[0, :, :, 2], rtol=1e-6
            )
            assert nc.variables["latitude"][0] == 90.0

    def test_registry_roundtrip(self, tmp_path):
        from msfno_tpu.inference.io import get_output

        o = get_output("netcdf", path=str(tmp_path / "nc"))
        p = o.write(np.zeros((4, 8, 2), np.float32), step=12)
        assert p.endswith("step_0012.nc") and os.path.exists(p)


def test_variables_filter_without_ordering_raises(tmp_path):
    """An output-variables request with no channel ordering to resolve names
    against must error, not silently write every channel."""
    from msfno_tpu.inference.io import FileOutput, NetCDFOutput

    with pytest.raises(ValueError):
        FileOutput(path=str(tmp_path / "a"), variables=["t2m"])
    with pytest.raises(ValueError):
        NetCDFOutput(path=str(tmp_path / "b"), variables=["t2m"])


def test_climatology_leap_year_alignment():
    """In a leap year every date after Feb 28 sits one day_of_year AHEAD of
    its slot in the 365-slot (leap-day-dropped) array; Feb 29 maps to the
    Feb-28 slot."""
    clim = np.arange(365, dtype=np.float32)[:, None, None, None, None] * (
        np.ones((1, 4, 2, 2, 1), np.float32)
    )
    # non-leap: Mar 1 is day_of_year 60 -> slot 59
    assert climatology_at(clim, 60, 0)[0, 0, 0] == 59
    # leap: Feb 29 is day_of_year 60 -> Feb-28 slot 58
    assert climatology_at(clim, 60, 0, leap_year=True)[0, 0, 0] == 58
    # leap: Mar 1 is day_of_year 61 -> slot 59 (was silently 60 before)
    assert climatology_at(clim, 61, 0, leap_year=True)[0, 0, 0] == 59
    # leap: Dec 31 is day_of_year 366 -> last slot 364
    assert climatology_at(clim, 366, 0, leap_year=True)[0, 0, 0] == 364


def test_forecast_writer_resumes_archive(tmp_path):
    """Re-opening an existing archive appends instead of clobbering."""
    from msfno_tpu.inference.forecast_writer import ForecastWriter

    lat, lon = np.zeros(2), np.zeros(2)
    w = ForecastWriter(str(tmp_path), ["a"], lat, lon)
    w.append(2020010100, np.ones((1, 2, 2, 1), np.float32))
    w2 = ForecastWriter(str(tmp_path), ["a"], lat, lon)
    w2.append(2020010106, 2 * np.ones((1, 2, 2, 1), np.float32))
    meta, arr = ForecastWriter.read(str(tmp_path))
    assert meta["times"] == [2020010100, 2020010106]
    assert arr.shape == (1, 2, 2, 2, 1)
    assert arr[0, 0, 0, 0, 0] == 1 and arr[0, 1, 0, 0, 0] == 2
    with pytest.raises(ValueError):
        ForecastWriter(str(tmp_path), ["b"], lat, lon)


def test_output_filter_validates_channel_count(tmp_path):
    """A filter index beyond the data's channels errors with a diagnosis,
    not a bare IndexError mid-write."""
    from msfno_tpu.inference.io import FileOutput

    o = FileOutput(path=str(tmp_path / "f"), variables=["c"],
                   ordering=["a", "b", "c"])
    with pytest.raises(ValueError):
        o.write(np.zeros((2, 2, 2), np.float32))  # only 2 channels


def test_hindcast_relabel_records_metadata(tmp_path):
    """HindcastReLabel metadata must land in the wrapped writer's output
    (reference outputs/__init__.py:193-218) instead of being swallowed."""
    import json as _json

    from msfno_tpu.inference.io import FileOutput, HindcastReLabel

    inner = FileOutput(path=str(tmp_path / "h"))
    w = HindcastReLabel(None, inner, reference_date=20200101, hdate=20100101)
    w.write(np.zeros((2, 2, 1), np.float32), step=0)
    m = _json.load(open(tmp_path / "h" / "manifest.json"))
    assert m["metadata"]["reference_date"] == 20200101
    assert m["metadata"]["hdate"] == 20100101
