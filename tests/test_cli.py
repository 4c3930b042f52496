"""CLI tests: parsing, config assembly, tiny end-to-end actions."""

import json
import os

import numpy as np
import pytest

from msfno_tpu.cli import build_parser, configs_from_args, main, parse_time_limit

TINY = [
    "--img-size", "16", "32", "--scale-factor", "2", "--in-chans", "3",
    "--out-chans", "3", "--embed-dim", "8", "--num-layers", "2",
    "--spectral-layers", "1", "--synthetic-data",
]


class TestParsing:
    def test_defaults_match_reference(self):
        args = build_parser().parse_args([])
        assert args.model == "sfno"
        assert args.loss_fn == "L2Sphere_noSine"  # main.py:874
        assert args.scale_factor == 6
        assert args.embed_dim == 256
        assert args.num_layers == 12
        assert args.film_gen_type == "gcn_custom"  # main.py:130-134

    def test_time_limit(self):
        assert parse_time_limit("01:00:00") == 3600
        assert parse_time_limit("90") == 90
        assert parse_time_limit(None) is None

    def test_config_assembly(self):
        args = build_parser().parse_args(
            TINY + ["--model-version", "film", "--coarse-level", "2"]
        )
        mc, tc = configs_from_args(args)
        assert mc.img_size == (16, 32)
        assert mc.film is not None
        assert mc.film.num_film_features == mc.embed_dim
        assert tc.loss_fn == "L2Sphere_noSine"


class TestActions:
    def test_train_synthetic(self, tmp_path):
        rc = main(
            TINY
            + [
                "--train", "--num-iterations", "2", "--validation-interval", "0",
                "--output-path", str(tmp_path),
            ]
        )
        assert rc == 0
        assert any(f.endswith(".npz") for f in os.listdir(tmp_path))

    def test_run_action(self, tmp_path):
        rc = main(TINY + ["--run", "--lead-time", "12",
                          "--output-path", str(tmp_path)])
        assert rc == 0
        data = np.load(tmp_path / "forecast.npz")["forecast"]
        assert data.shape == (2, 1, 16, 32, 3)

    def test_test_performance(self, tmp_path, capsys):
        rc = main(TINY + ["--test-performance", "--output-path", str(tmp_path)])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert "model_fwd_s" in json.loads(out)

    def test_resume_checkpoint_roundtrip(self, tmp_path):
        rc = main(
            TINY
            + [
                "--train", "--num-iterations", "2", "--validation-interval", "0",
                "--output-path", str(tmp_path),
            ]
        )
        cps = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
        rc = main(
            TINY
            + [
                "--train", "--num-iterations", "1", "--validation-interval", "0",
                "--output-path", str(tmp_path),
                "--resume-checkpoint", str(tmp_path / cps[-1]),
            ]
        )
        assert rc == 0


def test_save_data_action(tmp_path):
    rc = main(TINY + ["--save-data", "--num-iterations", "2",
                      "--output-path", str(tmp_path)])
    assert rc == 0
    files = os.listdir(tmp_path / "data")
    assert len(files) == 2
    data = np.load(tmp_path / "data" / sorted(files)[0])
    assert "era5" in data


def test_film_weights_merge(tmp_path):
    """Train film briefly, save, then merge the film weights onto a fresh
    backbone via --film-weights + --run."""
    film_args = TINY + ["--model-version", "film", "--coarse-level", "2",
                        "--model-depth", "1", "--film-embed-dim", "8",
                        "--mlp-dim", "8", "--temporal-step", "2"]
    rc = main(film_args + ["--train", "--num-iterations", "1",
                           "--validation-interval", "0",
                           "--output-path", str(tmp_path)])
    assert rc == 0
    cps = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
    rc = main(film_args + ["--run", "--lead-time", "6",
                           "--film-weights", str(tmp_path / cps[-1]),
                           "--output-path", str(tmp_path / "run")])
    assert rc == 0
