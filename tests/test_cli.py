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


@pytest.fixture
def cli_store(tmp_path):
    """Tiny npy store matching the TINY config grid (16x32, 3ch) with SST at
    the coarse-level-2 film shape (7, 16)."""
    root = str(tmp_path / "store")
    os.makedirs(root)
    rng = np.random.default_rng(1)
    for i in range(16):
        np.save(f"{root}/era5_{i:06d}.npy",
                rng.standard_normal((16, 32, 3)).astype(np.float32))
        sst = rng.standard_normal((7, 16)).astype(np.float32)
        sst[0, :3] = np.nan
        np.save(f"{root}/sst_{i:06d}.npy", sst)
    return root


TINY_REAL = [a for a in TINY if a != "--synthetic-data"]


class TestRealDataActions:
    def test_train_real_data_end_to_end(self, tmp_path, cli_store):
        """--train --era5-path drives backend -> dataset -> PrefetchLoader ->
        trainer across epochs (reference set_dataloader, train.py:448-521)."""
        rc = main(
            TINY_REAL
            + [
                "--train", "--era5-path", cli_store, "--training-epochs", "2",
                "--validation-interval", "0", "--validation-batches", "1",
                "--output-path", str(tmp_path / "out"),
            ]
        )
        assert rc == 0
        cps = [f for f in os.listdir(tmp_path / "out") if f.endswith(".npz")]
        assert cps

    def test_train_film_real_data(self, tmp_path, cli_store):
        rc = main(
            TINY_REAL
            + [
                "--model-version", "film", "--coarse-level", "2",
                "--model-depth", "1", "--film-embed-dim", "8", "--mlp-dim", "8",
                "--temporal-step", "2",
                "--train", "--era5-path", cli_store,
                "--validation-interval", "0", "--validation-batches", "1",
                "--output-path", str(tmp_path / "out"),
            ]
        )
        assert rc == 0

    def test_orbax_checkpoint_save_and_resume(self, tmp_path):
        """--checkpoint-backend orbax saves directory checkpoints that
        --resume-checkpoint (and --resume-optimizer) consume directly —
        multi-host sharded saves are CLI-resumable (VERDICT r2 item 8)."""
        out = tmp_path / "out"
        rc = main(
            TINY
            + ["--train", "--num-iterations", "2", "--training-epochs", "1",
               "--validation-interval", "0", "--checkpoint-backend", "orbax",
               "--output-path", str(out)]
        )
        assert rc == 0
        cps = [f for f in os.listdir(out) if f.startswith("checkpoint_")]
        assert cps and all(os.path.isdir(out / c) for c in cps)
        from msfno_tpu.training.checkpoint import load_checkpoint, peek

        meta = peek(str(out / cps[-1]))
        assert meta["backend"] == "orbax" and meta["step"] == 2
        # resume continues AFTER the completed epoch 0 -> epochs=2 runs
        # exactly one more 1-iteration epoch
        rc = main(
            TINY
            + ["--train", "--num-iterations", "1", "--training-epochs", "2",
               "--validation-interval", "0",
               "--resume-checkpoint", str(out / cps[-1]),
               "--resume-optimizer",
               "--output-path", str(tmp_path / "out2")]
        )
        assert rc == 0
        # the resumed run continued the step counter from the orbax save
        resumed = [f for f in os.listdir(tmp_path / "out2")
                   if f.startswith("checkpoint_")]
        params, _, meta2 = load_checkpoint(
            str(tmp_path / "out2" / sorted(resumed)[-1])
        )
        assert meta2["step"] == 3

    def test_explicit_year_window_past_store_errors(self, tmp_path, cli_store):
        """Explicit --trainingset-*/--validationset-* flags outside the store
        must error, not silently train on the whole store (which could
        include the validation years).  Default year flags keep the
        warn-and-fall-back behavior for short stores."""
        argv = TINY_REAL + [
            "--train", "--era5-path", cli_store,
            "--trainingset-start-year", "2016",
            "--trainingset-end-year", "2018",
            "--validation-interval", "0", "--validation-batches", "1",
            "--output-path", str(tmp_path / "out"),
        ]
        with pytest.raises(SystemExit, match="fix the year flags"):
            main(argv)

    def test_explicit_end_year_overrun_errors(self, tmp_path, cli_store):
        """An explicit END year past the store must error too, not silently
        clamp to the store end (the user would believe they trained on the
        full requested range)."""
        argv = TINY_REAL + [
            "--train", "--era5-path", cli_store,
            "--trainingset-end-year", "1980",  # store holds 16 steps of 1979
            "--validation-interval", "0", "--validation-batches", "1",
            "--output-path", str(tmp_path / "out"),
        ]
        with pytest.raises(SystemExit, match="fix the year flags"):
            main(argv)

    def test_run_from_store_with_date(self, tmp_path, cli_store):
        """--run accepts the same store directory --train does, selecting
        the initial condition by --date/--time (regression: np.load on the
        directory used to IsADirectoryError)."""
        rc = main(
            TINY_REAL
            + [
                "--run", "--lead-time", "12", "--era5-path", cli_store,
                "--dataset-start-year", "1979",
                "--date", "19790102", "--time", "6",
                "--output-path", str(tmp_path),
            ]
        )
        assert rc == 0
        data = np.load(tmp_path / "forecast.npz")["forecast"]
        assert data.shape == (2, 1, 16, 32, 3)
        # index 5 = 1979-01-02 06:00 at 6h cadence: x0 really came from the
        # store (normalizer is identity at tiny scale, so step-0 input check
        # is implicit in the run completing with finite output)
        assert np.isfinite(data).all()

    FILM_ARGS = [
        "--model-version", "film", "--coarse-level", "2",
        "--model-depth", "1", "--film-embed-dim", "8", "--mlp-dim", "8",
        "--temporal-step", "2",
    ]

    def _recorded_sst_run(self, tmp_path, cli_store, monkeypatch, extra):
        """Run the filmed --run flow from the store, recording every SST
        frame index the window builder reads."""
        from msfno_tpu.data import era5 as era5_mod

        calls = []
        orig = era5_mod.NpyBackend.sst

        def spy(self, idx):
            calls.append(idx)
            return orig(self, idx)

        monkeypatch.setattr(era5_mod.NpyBackend, "sst", spy)
        rc = main(
            TINY_REAL + self.FILM_ARGS
            + ["--run", "--lead-time", "12", "--era5-path", cli_store,
               "--output-path", str(tmp_path / "run")]
            + extra
        )
        return rc, calls

    def test_filmed_run_store_sst_windows(self, tmp_path, cli_store,
                                          monkeypatch):
        """The store-SST windows fed at rollout step s must be the TRAINING
        convention's window index s+1 (trainer._rollout_loss feeds
        sst[step+1]): with --date -> index 3, T=2, past_sst=False the two
        6h steps read windows [4,5] and [5,6] (VERDICT r2 weak #5)."""
        rc, calls = self._recorded_sst_run(
            tmp_path, cli_store, monkeypatch,
            ["--date", "19790101", "--time", "18"],
        )
        assert rc == 0
        # calls[0] is the has-SST guard read at the init index
        assert calls[0] == 3
        assert calls[1:] == [4, 5, 5, 6]

    def test_filmed_run_store_sst_windows_past(self, tmp_path, cli_store,
                                               monkeypatch):
        """--past-sst shifts every window strictly before its step:
        window start = base + s + 1 - (T+1) -> [1,2] and [2,3]."""
        rc, calls = self._recorded_sst_run(
            tmp_path, cli_store, monkeypatch,
            ["--date", "19790101", "--time", "18", "--past-sst"],
        )
        assert rc == 0
        assert calls[1:] == [1, 2, 2, 3]

    def test_filmed_run_store_sst_overrun_errors(self, tmp_path, cli_store):
        """A lead time whose SST windows run past the store must error, not
        silently clamp to (and repeat) the boundary frame."""
        with pytest.raises(SystemExit, match="needs SST frames"):
            main(
                TINY_REAL + self.FILM_ARGS
                + ["--run", "--lead-time", "48", "--era5-path", cli_store,
                   "--date", "19790104",
                   "--output-path", str(tmp_path / "run")]
            )

    def test_run_from_store_date_out_of_range(self, tmp_path, cli_store):
        rc = main(
            TINY_REAL
            + [
                "--run", "--era5-path", cli_store,
                "--date", "20250101", "--output-path", str(tmp_path),
            ]
        )
        assert rc == 1

    def test_dataloader_speed_real(self, tmp_path, cli_store, capsys):
        rc = main(TINY_REAL + ["--test-dataloader-speed", "--era5-path",
                               cli_store, "--output-path", str(tmp_path)])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert "dataloader_s_per_batch" in json.loads(out)


class TestForecastAndEval:
    def test_save_forecast_dispatch(self, tmp_path):
        rc = main(
            TINY
            + [
                "--save-forecast", "--num-iterations", "1",
                "--multi-step-validation", "1",
                "--output-path", str(tmp_path),
            ]
        )
        assert rc == 0
        store = tmp_path / "forecast_store"
        assert store.exists() and any(store.iterdir())

    def test_eval_model_dispatch(self, tmp_path):
        rc = main(
            TINY
            + [
                "--train", "--num-iterations", "2", "--validation-interval", "0",
                "--output-path", str(tmp_path),
            ]
        )
        assert rc == 0
        rc = main(
            TINY
            + [
                "--eval-model", "--multi-step-validation", "1",
                "--output-path", str(tmp_path),
            ]
        )
        assert rc == 0
        assert (tmp_path / "eval").exists()

    def test_eval_model_no_checkpoints_errors(self, tmp_path):
        rc = main(TINY + ["--eval-model", "--output-path", str(tmp_path)])
        assert rc == 1

    def test_eval_model_from_weights_tar(self, tmp_path):
        """The one-command real-weights protocol (docs/REAL_WEIGHTS.md):
        a reference-format torch weights.tar passed straight to
        --checkpoint-list drives torch-free read -> convert -> rollout ->
        the reference's skill artifacts (per-variable MSE/skill .npy +
        plots, sfno/model.py:1292-1486)."""
        import numpy as np
        import torch

        from msfno_tpu.cli import build_parser, configs_from_args
        from msfno_tpu.models import get_model
        from msfno_tpu.models.convert import export_sfno_state_dict

        args = build_parser().parse_args(TINY)
        mc, _ = configs_from_args(args)
        wrapper = get_model("sfno", "latest", cfg=mc)
        params = wrapper.init_params()
        sd = {
            f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_sfno_state_dict(params).items()
        }
        tar = tmp_path / "weights.tar"
        torch.save({"model_state": sd}, str(tar))
        rc = main(
            TINY
            + [
                "--eval-model", "--checkpoint-list", str(tar),
                "--multi-step-validation", "1",
                "--output-path", str(tmp_path),
            ]
        )
        assert rc == 0
        evaldir = tmp_path / "eval"
        assert any(
            f.endswith("_skill.npy") for f in os.listdir(evaldir)
        ), os.listdir(evaldir)
        assert any(
            f.endswith("_mse_model.npy") for f in os.listdir(evaldir)
        )

    def test_run_from_weights_tar(self, tmp_path):
        """--run --resume-checkpoint weights.tar (docs/REAL_WEIGHTS.md §3):
        no config JSON in a torch checkpoint, so architecture comes from the
        flags; wrapper.load_model converts on the fly."""
        import numpy as np
        import torch

        from msfno_tpu.cli import build_parser, configs_from_args
        from msfno_tpu.models import get_model
        from msfno_tpu.models.convert import export_sfno_state_dict

        args = build_parser().parse_args(TINY)
        mc, _ = configs_from_args(args)
        wrapper = get_model("sfno", "latest", cfg=mc)
        params = wrapper.init_params()
        sd = {
            f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_sfno_state_dict(params).items()
        }
        tar = tmp_path / "weights.tar"
        torch.save({"model_state": sd}, str(tar))
        rc = main(
            TINY
            + [
                "--run", "--lead-time", "12",
                "--resume-checkpoint", str(tar),
                "--output-path", str(tmp_path),
            ]
        )
        assert rc == 0
        data = np.load(tmp_path / "forecast.npz")["forecast"]
        assert np.isfinite(data).all()

    def test_filmed_train_resume_from_backbone_tar(self, tmp_path):
        """--train --model-version film --resume-checkpoint <backbone tar>:
        the backbone-only torch checkpoint must OVERLAY the initialized
        filmed tree (keeping the fresh film generator, reference
        strict=False semantics, model.py:216-256), not replace it — a
        wholesale replace desyncs the param tree from the opt_state and
        crashes the first train step."""
        import numpy as np
        import torch

        from msfno_tpu.cli import build_parser, configs_from_args
        from msfno_tpu.models import get_model
        from msfno_tpu.models.convert import export_sfno_state_dict

        args = build_parser().parse_args(TINY)
        mc, _ = configs_from_args(args)
        wrapper = get_model("sfno", "latest", cfg=mc)
        sd = {
            f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_sfno_state_dict(wrapper.init_params()).items()
        }
        tar = tmp_path / "weights.tar"
        torch.save({"model_state": sd}, str(tar))
        rc = main(
            TINY
            + ["--model-version", "film", "--coarse-level", "2",
               "--model-depth", "1", "--film-embed-dim", "8",
               "--mlp-dim", "8", "--temporal-step", "2",
               "--train", "--num-iterations", "1",
               "--validation-interval", "0",
               "--resume-checkpoint", str(tar),
               "--output-path", str(tmp_path / "out")]
        )
        assert rc == 0
        assert any(
            f.startswith("checkpoint_")
            for f in os.listdir(tmp_path / "out")
        )

    def test_torch_sniff_ignores_directories(self, tmp_path):
        """A checkpoint DIRECTORY whose name ends in .ckpt (e.g. a renamed
        orbax save) must not route to the torch zip/pickle reader."""
        from msfno_tpu.models.convert import is_torch_checkpoint

        d = tmp_path / "run1.ckpt"
        d.mkdir()
        assert not is_torch_checkpoint(str(d))
        assert is_torch_checkpoint(str(tmp_path / "weights.tar"))


class TestResumeSemantics:
    def _train_once(self, tmp_path, extra=()):
        rc = main(
            TINY
            + [
                "--train", "--num-iterations", "2", "--validation-interval", "0",
                "--output-path", str(tmp_path),
            ]
            + list(extra)
        )
        assert rc == 0
        return sorted(
            f for f in os.listdir(tmp_path) if f.endswith(".npz")
        )[-1]

    def test_resume_restores_params_non_filmed(self, tmp_path):
        """Non-filmed resume must actually load the checkpoint weights
        (reference restores model+optimizer+counters, main.py:179-246)."""
        from msfno_tpu.cli import restore_train_state
        from msfno_tpu.training.checkpoint import load_checkpoint

        cp = self._train_once(tmp_path)
        args = build_parser().parse_args(
            TINY + ["--train", "--resume-checkpoint", str(tmp_path / cp)]
        )
        from msfno_tpu.cli import configs_from_args
        from msfno_tpu.models import get_model

        mc, tc = configs_from_args(args)
        wrapper = get_model("sfno", "latest", cfg=mc)
        trainer = wrapper.trainer(tc)
        state = trainer.init_state()
        state = restore_train_state(state, trainer, args, mc, tc)
        saved, _, meta = load_checkpoint(str(tmp_path / cp))
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(state.trainable),
            jax.tree_util.tree_leaves(saved),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(state.step) == meta["step"]

    def test_resume_optimizer_flag(self, tmp_path):
        cp = self._train_once(tmp_path)
        rc = main(
            TINY
            + [
                "--train", "--num-iterations", "1", "--validation-interval", "0",
                "--resume-checkpoint", str(tmp_path / cp), "--resume-optimizer",
                "--output-path", str(tmp_path / "resume"),
            ]
        )
        assert rc == 0

    def test_resume_scheduler_fast_forwards(self, tmp_path):
        from msfno_tpu.cli import configs_from_args, restore_train_state
        from msfno_tpu.models import get_model

        cp = self._train_once(tmp_path)
        args = build_parser().parse_args(
            TINY + ["--train", "--resume-checkpoint", str(tmp_path / cp),
                    "--resume-scheduler", "--scheduler", "cosine"]
        )
        mc, tc = configs_from_args(args)
        wrapper = get_model("sfno", "latest", cfg=mc)
        trainer = wrapper.trainer(tc)
        state = trainer.init_state()
        state = restore_train_state(state, trainer, args, mc, tc)
        import optax

        # ONLY the LR-schedule position fast-forwards; adam's bias-correction
        # count must stay 0 alongside its fresh zero moments (otherwise the
        # first post-resume updates skip warmup damping and spike ~3x)
        sched_counts, adam_counts = [], []

        def collect(node):
            if isinstance(node, optax.ScaleByScheduleState):
                sched_counts.append(int(node.count))
            elif isinstance(node, optax.ScaleByAdamState):
                adam_counts.append(int(node.count))
            if hasattr(node, "_fields"):
                for f in node._fields:
                    collect(getattr(node, f))
            elif isinstance(node, (tuple, list)):
                for x in node:
                    collect(x)

        collect(state.opt_state)
        assert sched_counts and all(c == int(state.step) for c in sched_counts)
        assert all(c == 0 for c in adam_counts)


class TestExplicitFlags:
    def test_detects_equals_form_and_programmatic_argv(self):
        """merge_resume_config must honor --flag=value spellings and
        main(argv=[...]) calls — naive sys.argv string matching missed
        both, so checkpoint values silently overrode explicit flags."""
        from msfno_tpu.cli import explicit_flags

        passed = explicit_flags(["--mlp-ratio=4.0", "--learning-rate", "1e-3"])
        assert "mlp_ratio" in passed and "learning_rate" in passed
        assert "embed_dim" not in passed

    def test_detects_prefix_abbreviation(self):
        from msfno_tpu.cli import explicit_flags

        # argparse resolves unambiguous prefixes; detection must too
        passed = explicit_flags(["--mlp-rat", "4.0"])
        assert "mlp_ratio" in passed

    def test_resume_merge_honors_equals_form(self, tmp_path):
        from msfno_tpu.cli import (
            build_parser,
            configs_from_args,
            merge_resume_config,
            postprocess_args,
        )
        from msfno_tpu.training.checkpoint import save_checkpoint
        from msfno_tpu.utils.config import to_json

        argv = TINY + ["--train", "--mlp-ratio=3.0"]
        args = build_parser().parse_args(argv)
        postprocess_args(args)
        model_cfg, _ = configs_from_args(args)
        # checkpoint stored with the default mlp_ratio
        stored_cfg, _ = configs_from_args(
            postprocess_args(build_parser().parse_args(TINY))
        )
        cp = str(tmp_path / "cp.npz")
        save_checkpoint(cp, {"x": np.zeros(1)}, config_json=to_json(stored_cfg))
        args.resume_checkpoint = cp
        merged, _ = merge_resume_config(model_cfg, args, argv=argv)
        assert merged.mlp_ratio == 3.0


class TestArgPostprocessing:
    def test_step_skip_expansion(self):
        from msfno_tpu.cli import postprocess_args

        args = build_parser().parse_args(
            ["--multi-step-training", "2", "--training-step-skip", "1",
             "--multi-step-validation", "3", "--validation-step-skip", "2"]
        )
        postprocess_args(args)
        assert args.multi_step_training == 4  # 2 + 1*2 (main.py:115-124)
        assert args.multi_step_validation == 9  # 3 + 2*3

    def test_scheduler_horizon_rescale(self):
        from msfno_tpu.cli import postprocess_args

        args = build_parser().parse_args(
            ["--scheduler", "cosine", "--scheduler-horizon", "2000",
             "--batch-size", "2", "--accumulation-steps", "1"]
        )
        postprocess_args(args, world_size=2)
        assert args.scheduler_horizon == 2000 // (2 * 2 * 2)

    def test_no_rescale_without_scheduler(self):
        from msfno_tpu.cli import postprocess_args

        args = build_parser().parse_args(["--scheduler-horizon", "2000"])
        postprocess_args(args)
        assert args.scheduler_horizon == 2000


def test_mae_pretrain_action(tmp_path):
    """--train --model mae runs SST pretraining (stochastic mask ratio) and
    writes a checkpoint (reference mae --train, train.py:318-339)."""
    rc = main([
        "--model", "mae", "--train", "--synthetic-data",
        "--img-size", "17", "32", "--scale-factor", "2",
        "--in-chans", "3", "--out-chans", "3", "--embed-dim", "8",
        "--num-layers", "1", "--spectral-layers", "1",
        "--model-depth", "1", "--film-embed-dim", "32", "--mlp-dim", "32",
        "--temporal-step", "4", "--coarse-level", "1",
        "--patch-size", "4", "4", "4",
        "--num-iterations", "2", "--output-path", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "checkpoint_mae_final.npz").exists()


def test_run_netcdf_output(tmp_path):
    """--run --output netcdf writes per-step real NetCDF files."""
    rc = main(TINY + ["--run", "--lead-time", "12", "--output", "netcdf",
                      "--output-path", str(tmp_path)])
    assert rc == 0
    files = sorted((tmp_path / "forecast").glob("*.nc"))
    assert len(files) == 2
    from scipy.io import netcdf_file

    with netcdf_file(str(files[0]), "r") as nc:
        assert "latitude" in nc.variables and int(nc.variables["step"][0]) == 6


def test_save_data_real_store(tmp_path, cli_store):
    rc = main(TINY_REAL + ["--save-data", "--era5-path", cli_store,
                           "--num-iterations", "2",
                           "--output-path", str(tmp_path)])
    assert rc == 0
    files = sorted((tmp_path / "data").glob("batch_*.npz"))
    assert len(files) == 2
    d = np.load(files[0])
    # non-filmed model: SST intentionally not loaded (with_sst=False)
    assert d["era5"].shape[-1] == 3 and "sst" not in d


class TestResumeEpoch:
    def test_resume_starts_after_checkpoint_epoch(self, tmp_path):
        """A resumed run continues at the next epoch instead of re-running
        (and re-numbering checkpoints of) the completed ones (reference
        train.py:53-66: while self.epoch < epochs from the restored count)."""
        from msfno_tpu.cli import configs_from_args, restore_train_state
        from msfno_tpu.models import get_model

        rc = main(
            TINY
            + ["--train", "--num-iterations", "2", "--validation-interval",
               "0", "--output-path", str(tmp_path)]
        )
        assert rc == 0
        cp = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))[-1]
        args = build_parser().parse_args(
            TINY + ["--train", "--resume-checkpoint", str(tmp_path / cp)]
        )
        mc, tc = configs_from_args(args)
        wrapper = get_model("sfno", "latest", cfg=mc)
        trainer = wrapper.trainer(tc)
        state = trainer.init_state()
        restore_train_state(state, trainer, args, mc, tc)
        assert trainer.start_epoch == trainer.epoch + 1
        # one-shot: a fresh train() consumes it, later calls start at 0
        trainer.tcfg = __import__("dataclasses").replace(
            trainer.tcfg, training_epochs=0
        )
        trainer.train(state, num_batches=0)
        assert trainer.start_epoch == 0


def test_mae_pretrain_sst_only_store(tmp_path):
    """--train --model mae --sst-path works on a pure-SST store (no
    era5_*.npy) via SSTNpyStore — the reference's pretraining input
    (SST_galvani) likewise has no ERA5 fields."""
    store = tmp_path / "sstonly"
    os.makedirs(store)
    rng = np.random.default_rng(2)
    for i in range(10):
        sst = rng.standard_normal((16, 32)).astype(np.float32)
        sst[0, :4] = np.nan
        np.save(store / f"sst_{i:06d}.npy", sst)
    rc = main([
        "--model", "mae", "--train", "--sst-path", str(store),
        "--img-size", "17", "32", "--scale-factor", "2",
        "--in-chans", "3", "--out-chans", "3", "--embed-dim", "8",
        "--num-layers", "1", "--spectral-layers", "1",
        "--model-depth", "1", "--film-embed-dim", "32", "--mlp-dim", "32",
        "--temporal-step", "4", "--coarse-level", "1",
        "--patch-size", "4", "4", "4",
        "--training-epochs", "1", "--batch-size", "2",
        "--output-path", str(tmp_path / "out"),
    ])
    assert rc == 0
    assert (tmp_path / "out" / "checkpoint_mae_final.npz").exists()


def test_debug_flag_is_logging_only(tmp_path):
    """--debug must not enable jax_debug_nans: NaN-coded land SST is valid
    data and would false-positive (see the note in cli.main)."""
    import jax

    rc = main(
        TINY
        + ["--debug", "--model-version", "film", "--coarse-level", "2",
           "--model-depth", "1", "--film-embed-dim", "8", "--mlp-dim",
           "8", "--temporal-step", "2", "--train", "--num-iterations",
           "1", "--validation-interval", "0",
           "--output-path", str(tmp_path)]
    )
    assert rc == 0
    assert not jax.config.jax_debug_nans


def test_cpu_flag(tmp_path):
    """--cpu (reference main.py) forces the host CPU backend; in the test
    session the backend is already CPU, so it must be a safe no-op that
    leaves the action working end-to-end."""
    import jax

    rc = main(
        TINY
        + ["--cpu", "--train", "--num-iterations", "1",
           "--validation-interval", "0", "--output-path", str(tmp_path)]
    )
    assert rc == 0
    assert jax.default_backend() == "cpu"
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path))


class TestReferenceFlagParity:
    def test_lin_probe_action(self, tmp_path):
        """--train --model mae --model-version lin-probe ridge-fits
        precomputed cls tokens to ONI (reference main.py:554-562)."""
        rng = np.random.default_rng(0)
        w_true = rng.standard_normal(8)
        cls = rng.standard_normal((50, 8)).astype(np.float32)
        oni = (cls @ w_true + 0.01 * rng.standard_normal(50)).astype(
            np.float32
        )
        np.save(tmp_path / "cls.npy", cls)
        np.save(tmp_path / "oni.npy", oni)
        rc = main([
            "--model", "mae", "--model-version", "lin-probe", "--train",
            "--film-embed-dim", "8",
            "--cls", str(tmp_path / "cls.npy"),
            "--oni-path", str(tmp_path / "oni.npy"),
            "--output-path", str(tmp_path / "out"),
        ])
        assert rc == 0
        assert (tmp_path / "out" / "checkpoint_linprobe.npz").exists()

    def test_sfno_weights_loads_backbone(self, tmp_path):
        """--sfno-weights seeds the frozen backbone for film fine-tuning
        (reference main.py:410)."""
        rc = main(TINY + ["--train", "--num-iterations", "1",
                          "--validation-interval", "0",
                          "--output-path", str(tmp_path)])
        assert rc == 0
        cp = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))[-1]
        rc = main(
            TINY
            + ["--model-version", "film", "--coarse-level", "2",
               "--model-depth", "1", "--film-embed-dim", "8", "--mlp-dim",
               "8", "--temporal-step", "2", "--train", "--num-iterations",
               "1", "--validation-interval", "0",
               "--sfno-weights", str(tmp_path / cp),
               "--output-path", str(tmp_path / "film")]
        )
        assert rc == 0

    def test_dropout_flag_reaches_film_config(self):
        args = build_parser().parse_args(
            TINY + ["--model-version", "film", "--dropout", "0.3"]
        )
        mc, _ = configs_from_args(args)
        assert mc.film.dropout == 0.3

    def test_batch_size_validation_and_no_shuffle(self, tmp_path, cli_store):
        rc = main(
            TINY_REAL
            + ["--train", "--era5-path", cli_store, "--no-shuffle",
               "--batch-size-validation", "2", "--training-epochs", "1",
               "--validation-interval", "0", "--validation-batches", "1",
               "--output-path", str(tmp_path / "out")]
        )
        assert rc == 0

    def test_hindcast_run_metadata(self, tmp_path):
        rc = main(TINY + ["--run", "--lead-time", "6", "--output", "file",
                          "--hindcast", "--hindcast-reference-year", "2015",
                          "--output-path", str(tmp_path)])
        assert rc == 0
        m = json.load(open(tmp_path / "forecast" / "manifest.json"))
        assert str(m["metadata"]["reference_date"]).startswith("2015")


class TestCLIMesh:
    """The CLI constructs the SPMD mesh itself (VERDICT r3 missing #1): the
    reference wires its launcher into the CLI (main.py:39-49, 1149-1156);
    here --mesh auto|none|D,L,C flows into Trainer/rollout/eval."""

    def _capture_train(self, monkeypatch):
        from msfno_tpu.training.trainer import Trainer

        captured = {}
        orig = Trainer.train

        def spy(self, state, *a, **kw):
            out = orig(self, state, *a, **kw)
            captured["state"] = out
            captured["mesh"] = self.mesh
            return out

        monkeypatch.setattr(Trainer, "train", spy)
        return captured

    def test_train_sharded_end_to_end(self, tmp_path, monkeypatch):
        from flax import traverse_util

        from msfno_tpu.parallel import sharded_sht

        captured = self._capture_train(monkeypatch)
        n0 = sharded_sht.construction_count()
        rc = main(
            TINY
            + ["--train", "--mesh", "2,2,2", "--batch-size", "2",
               "--num-iterations", "2", "--validation-interval", "0",
               "--output-path", str(tmp_path)]
        )
        assert rc == 0
        mesh = captured["mesh"]
        assert mesh is not None
        assert dict(mesh.shape) == {"data": 2, "lat": 2, "channel": 2}
        # lat>1: the explicit all_to_all SHT must have engaged
        assert sharded_sht.construction_count() > n0
        # the returned state is genuinely sharded (pos_embed over lat/channel)
        flat = traverse_util.flatten_dict(captured["state"].trainable)
        pos = next(v for k, v in flat.items() if k[-1] == "pos_embed")
        assert not pos.sharding.is_fully_replicated
        # and the checkpoint written from the sharded state is loadable
        cps = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
        assert cps

    def test_mesh_auto_uses_all_devices(self, tmp_path, monkeypatch):
        import jax

        captured = self._capture_train(monkeypatch)
        rc = main(
            TINY
            + ["--train", "--num-iterations", "1",
               "--validation-interval", "0", "--output-path", str(tmp_path)]
        )
        assert rc == 0
        import math

        mesh = captured["mesh"]
        assert mesh is not None
        assert math.prod(mesh.shape.values()) == len(jax.devices())

    def test_mesh_none_escape_hatch(self, tmp_path, monkeypatch):
        captured = self._capture_train(monkeypatch)
        rc = main(
            TINY
            + ["--train", "--mesh", "none", "--num-iterations", "1",
               "--validation-interval", "0", "--output-path", str(tmp_path)]
        )
        assert rc == 0
        assert captured["mesh"] is None

    def test_mesh_flag_validation(self, tmp_path):
        with pytest.raises(SystemExit):
            main(TINY + ["--train", "--mesh", "2x2", "--num-iterations", "1",
                         "--output-path", str(tmp_path)])
        with pytest.raises(SystemExit):
            main(TINY + ["--train", "--mesh", "16,16,16",
                         "--num-iterations", "1",
                         "--output-path", str(tmp_path)])

    def test_run_sharded(self, tmp_path):
        rc = main(TINY + ["--run", "--mesh", "2,2,2", "--lead-time", "12",
                          "--output-path", str(tmp_path)])
        assert rc == 0
        data = np.load(tmp_path / "forecast.npz")["forecast"]
        assert data.shape[0] == 2 and np.isfinite(data).all()

    def test_eval_model_sharded(self, tmp_path):
        rc = main(
            TINY
            + ["--train", "--mesh", "none", "--num-iterations", "1",
               "--validation-interval", "0", "--output-path", str(tmp_path)]
        )
        assert rc == 0
        rc = main(
            TINY
            + ["--eval-model", "--mesh", "2,2,2",
               "--output-path", str(tmp_path)]
        )
        assert rc == 0
        assert (tmp_path / "eval" / "skill.pdf").exists()


def test_run_rejects_hhmm_time(tmp_path):
    """The reference's HHMM --time spelling must error loudly, not wrap
    modulo 24 to the wrong hour (ADVICE r3 / docs/MIGRATION.md)."""
    with pytest.raises(SystemExit, match="hour 0-23"):
        main(TINY + ["--run", "--mesh", "none", "--lead-time", "6",
                     "--time", "1200", "--output-path", str(tmp_path)])


def test_sht_mxu_dtype_flag():
    from msfno_tpu.cli import build_parser, configs_from_args

    args = build_parser().parse_args(TINY + ["--sht-mxu-dtype", "bfloat16"])
    mc, _ = configs_from_args(args)
    assert mc.sht_mxu_dtype == "bfloat16"


def test_save_forecast_sharded(tmp_path):
    """--save-forecast under the CLI mesh: the scan_rollout inside
    save_forecast runs SPMD (trainer.mesh flows through)."""
    rc = main(
        TINY
        + ["--save-forecast", "--mesh", "2,2,2", "--batch-size", "2",
           "--multi-step-validation", "1", "--num-iterations", "1",
           "--output-path", str(tmp_path)]
    )
    assert rc == 0
    assert (tmp_path / "forecast_store" / "header.json").exists()


def test_profile_dir_flag(tmp_path):
    """--profile-dir captures a TensorBoard-loadable trace around the
    action (no reference analogue, SURVEY §5.1)."""
    prof = tmp_path / "trace"
    rc = main(TINY + ["--train", "--mesh", "none", "--num-iterations", "1",
                      "--validation-interval", "0",
                      "--profile-dir", str(prof),
                      "--output-path", str(tmp_path)])
    assert rc == 0
    # jax writes plugins/profile/<ts>/*.xplane.pb under the trace dir
    found = list(prof.rglob("*.xplane.pb"))
    assert found, f"no trace files under {prof}"
