"""Command-line interface (reference main.py:384-1137).

Same argument groups (Data, Inference, Training, Evaluate, Logging,
Architecture, Architecture Film Gen) and action flags; config objects are
assembled from the groups and, on --resume-checkpoint, merged with the
checkpoint's stored hyperparameters — explicitly passed CLI flags win,
architecture groups are protected (reference merge policy, main.py:179-246).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

log = logging.getLogger("msfno_tpu")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("msfno_tpu", description=__doc__)
    p.add_argument("--model", default="sfno", choices=["sfno", "fcn", "mae"])
    p.add_argument("--model-version", default="latest",
                   help="sfno: latest|film; fcn: 0|1; mae: latest|lin-probe")
    p.add_argument("--assets", default=None, help="asset directory (stats, weights)")
    p.add_argument("--output-path", default="./output")
    p.add_argument("--resume-checkpoint", default=None)
    p.add_argument("--film-weights", default=None,
                   help="film-generator checkpoint merged onto the backbone")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (reference main.py --cpu); "
                   "also useful when the remote-TPU link is unavailable")

    # actions (dispatch per reference main.py:261-339)
    act = p.add_argument_group("Actions")
    act.add_argument("--train", action="store_true")
    act.add_argument("--run", action="store_true")
    act.add_argument("--eval-model", action="store_true")
    act.add_argument("--save-forecast", action="store_true")
    act.add_argument("--test-performance", action="store_true")
    act.add_argument("--test-dataloader-speed", action="store_true")
    act.add_argument("--test-batch-size", action="store_true")
    act.add_argument("--save-data", action="store_true",
                     help="dump raw batches to npz (reference main.py:293)")
    act.add_argument("--dump-provenance", action="store_true")

    data = p.add_argument_group("Data and Data Sources")
    data.add_argument("--era5-path", default=None, help="ERA5 zarr/npy store")
    data.add_argument("--sst-path", default=None)
    data.add_argument("--synthetic-data", action="store_true",
                      help="use the synthetic generator (no data on disk)")
    data.add_argument("--dataset-start-year", type=int, default=1979,
                      help="first year present in the store (time index origin)")
    data.add_argument("--trainingset-start-year", type=int, default=1979)
    data.add_argument("--trainingset-end-year", type=int, default=2016)
    data.add_argument("--validationset-start-year", type=int, default=2016)
    data.add_argument("--validationset-end-year", type=int, default=2018)
    data.add_argument("--training-workers", type=int, default=4)
    data.add_argument("--batch-size", type=int, default=1)
    data.add_argument("--validation-batches", type=int, default=4,
                      help="validation batches per validation pass")
    data.add_argument("--past-sst", action="store_true",
                      help="SST windows strictly before each step "
                           "(reference past_sst, data.py:208-211)")
    data.add_argument("--climatology-path", default=None,
                      help=".npy climatology for --eval-model skill scores")
    data.add_argument("--no-shuffle", action="store_true",
                      help="disable training-loader shuffling (main.py:580)")
    data.add_argument("--batch-size-validation", type=int, default=None,
                      help="validation batch size (defaults to --batch-size; "
                           "main.py:778)")
    data.add_argument("--input-transfer-dtype", default="float32",
                      choices=["float32", "bfloat16"],
                      help="dtype of era5/SST fields as transferred to the "
                           "device; bfloat16 halves host->device bytes "
                           "(cast in loader workers, overlapped) at ~0.4%% "
                           "relative input error — for transfer-bandwidth-"
                           "bound pipelines (BASELINE.md round-4 section)")
    data.add_argument("--cls", default=None,
                      help=".npy of precomputed MAE cls tokens "
                           "(lin-probe input, main.py:554)")
    data.add_argument("--oni-path", default=None,
                      help=".npy of ONI indices (lin-probe target, "
                           "main.py:560)")

    run = p.add_argument_group("Inference Parameters")
    run.add_argument("--lead-time", type=int, default=24, help="hours")
    run.add_argument("--date", default=None, help="YYYYMMDD initial condition")
    run.add_argument("--time", type=int, default=0)
    run.add_argument("--output", default="npz",
                     choices=["npz", "file", "netcdf", "none"])
    run.add_argument("--output-variables", default=None,
                     help="JSON list of variables to write "
                          "(reference output-variables.json)")
    run.add_argument("--hindcast", action="store_true",
                     help="relabel outputs with hindcast metadata")
    run.add_argument("--hindcast-reference-year", type=int, default=None,
                     help="reference year for hindcast relabeling "
                          "(main.py:626)")

    tr = p.add_argument_group("Training Parameters")
    tr.add_argument("--learning-rate", type=float, default=5e-4)
    tr.add_argument("--optimizer", default="adam", choices=["adam", "adamw", "sgd"])
    tr.add_argument("--weight-decay", type=float, default=0.0)
    tr.add_argument("--scheduler", default="none",
                    choices=["none", "cosine", "step"])
    tr.add_argument("--scheduler-horizon", type=int, default=2000)
    tr.add_argument("--loss-fn", default="L2Sphere_noSine")
    tr.add_argument("--training-epochs", type=int, default=1)
    tr.add_argument("--multi-step-training", type=int, default=0)
    tr.add_argument("--training-step-skip", type=int, default=0)
    tr.add_argument("--discount-factor", type=float, default=1.0)
    tr.add_argument("--accumulation-steps", type=int, default=0)
    tr.add_argument("--validation-interval", type=int, default=100)
    tr.add_argument("--multi-step-validation", type=int, default=0)
    tr.add_argument("--validation-step-skip", type=int, default=0)
    tr.add_argument("--save-checkpoint-interval", type=int, default=1)
    tr.add_argument("--retrain-film", action="store_true")
    tr.add_argument("--dropout", type=float, default=0.0,
                    help="film-generator dropout (main.py:864)")
    tr.add_argument("--set-epoch", type=int, default=None,
                    help="start the epoch loop here (overrides the "
                         "checkpoint's epoch; main.py:940)")
    tr.add_argument("--sfno-weights", default=None,
                    help="pretrained SFNO backbone weights (.tar/.npz) to "
                         "load before film fine-tuning (main.py:410)")
    tr.add_argument("--batch-size-step", type=int, default=0,
                    help="linear growth step for --test-batch-size "
                         "(0 = geometric 1,2,4,...; main.py:907)")
    tr.add_argument("--resume-optimizer", action="store_true",
                    help="restore optimizer state from --resume-checkpoint "
                         "(reference train.py:398-402)")
    tr.add_argument("--resume-scheduler", action="store_true",
                    help="restore LR-schedule position from --resume-checkpoint "
                         "(reference train.py:428-431)")
    tr.add_argument("--film-scale-start", type=float, default=0.0)
    tr.add_argument("--bf16-frozen-params", action="store_true",
                    help="store the frozen backbone in bfloat16 (halves "
                         "frozen-param HBM traffic; fast/bf16 config only)")
    tr.add_argument("--time-limit", default=None,
                    help="HH:MM:SS graceful-stop wall limit (main.py:149-156)")
    tr.add_argument("--checkpoint-backend", default="npz",
                    choices=["npz", "orbax"],
                    help="checkpoint save format; orbax writes sharded "
                         "directories in parallel across hosts (resume "
                         "accepts either format)")
    tr.add_argument("--async-checkpoint", action="store_true",
                    help="with --checkpoint-backend orbax: snapshot and "
                         "return immediately, writing the checkpoint in "
                         "the background (full-size saves are ~10-20 s of "
                         "blocking I/O otherwise)")
    tr.add_argument("--scan-steps", default="1",
                    help="fuse this many optimizer steps into one lax.scan "
                         "launch (amortizes per-step dispatch; cadence "
                         "semantics unchanged, 1 = per-batch dispatch). "
                         "'auto' derives K from validation-interval and an "
                         "HBM budget for the stacked input chunk "
                         "(trainer.auto_scan_steps)")
    tr.add_argument("--num-iterations", type=int, default=10,
                    help="synthetic batches per epoch")

    ev = p.add_argument_group("Evaluate Models")
    ev.add_argument("--checkpoint-list", nargs="*", default=None)
    ev.add_argument("--eval-sfno", action="store_true",
                    help="include the scale=0 pure-SFNO baseline")

    lg = p.add_argument_group("Logging")
    lg.add_argument("--log-file", default=None)
    lg.add_argument("--profile-dir", default=None,
                    help="capture a jax/XLA profiler trace of the action "
                         "into this directory (TensorBoard-loadable; the "
                         "reference has no profiler integration, SURVEY "
                         "§5.1)")
    lg.add_argument("--advanced-logging", action="store_true")
    lg.add_argument("--wandb", action="store_true")
    lg.add_argument("--wandb-resume", default=None, metavar="RUN_ID",
                    help="resume an existing wandb run (resume='must', "
                    "reference train.py:106-114)")

    arch = p.add_argument_group("Architecture")
    arch.add_argument("--spectral-transform", default="sht", choices=["sht", "fft"])
    arch.add_argument("--filter-type", default="non-linear",
                      choices=["non-linear", "linear"])
    arch.add_argument("--img-size", type=int, nargs=2, default=[721, 1440])
    arch.add_argument("--scale-factor", type=int, default=6)
    arch.add_argument("--in-chans", type=int, default=73)
    arch.add_argument("--out-chans", type=int, default=73)
    arch.add_argument("--embed-dim", type=int, default=256)
    arch.add_argument("--num-layers", type=int, default=12)
    arch.add_argument("--spectral-layers", type=int, default=3)
    arch.add_argument("--mlp-ratio", type=float, default=2.0)
    arch.add_argument("--normalization-layer", default="instance_norm")
    arch.add_argument("--hard-thresholding-fraction", type=float, default=1.0)
    arch.add_argument("--compression", default=None, choices=[None, "tt"])
    arch.add_argument("--rank", type=int, default=128)
    arch.add_argument("--checkpointing-mlp", action="store_true")
    arch.add_argument("--checkpointing-block", action="store_true")
    arch.add_argument("--checkpointing-encoder", action="store_true")
    arch.add_argument("--checkpointing-decoder", action="store_true")
    arch.add_argument("--compute-dtype", default="float32",
                      choices=["float32", "bfloat16"])
    arch.add_argument("--output-dtype", default="float32",
                      choices=["float32", "bfloat16"],
                      help="model output field dtype; bfloat16 halves the "
                           "rollout carry copy + decoder write on the "
                           "serving tier (training keeps float32 targets)")
    arch.add_argument("--use-pallas", action="store_true")
    arch.add_argument("--spectral-mxu-dtype", default="float32",
                      choices=["float32", "bfloat16"])
    arch.add_argument("--sht-mxu-dtype", default="float32",
                      choices=["float32", "bfloat16"],
                      help="MXU input dtype for the SHT's DFT/Legendre "
                           "matmuls (fp32 accumulate); bfloat16 is the "
                           "fast-tier setting")
    arch.add_argument("--pallas-grid-mlp", action="store_true",
                      help="fused Pallas kernel for the full-res "
                      "encoder/decoder MLPs (hidden state stays in VMEM)")
    arch.add_argument("--grid-mlp-mxu-dtype", default="bfloat16",
                      choices=["float32", "bfloat16"])
    arch.add_argument("--no-fuse-decoder-tail", action="store_true",
                      help="disable the fused spectral->output decoder tail "
                           "(ops/pallas/spectral_decoder.py; engages with "
                           "--pallas-grid-mlp on the standard SHT/instance-"
                           "norm/big-skip configuration)")
    arch.add_argument("--no-fuse-encoder-dft", action="store_true",
                      help="disable the fused encoder->spectral head "
                           "(ops/pallas/grid_mlp.py:grid_encoder_spectral)")
    arch.add_argument("--fuse-inner-mlp", action="store_true",
                      help="fold inner-block norm1+FiLM and the outer "
                           "identity skip into the channel-MLP kernel "
                           "(blocks.py fuse_mlp_affine)")
    arch.add_argument("--no-pallas-gcn", action="store_true",
                      help="disable the fused GCN-layer kernel in the "
                           "gcn/gcn_custom film generators "
                           "(ops/pallas/gcn_layer.py)")

    dist = p.add_argument_group("Distributed")
    dist.add_argument("--mesh", default="auto",
                      help="SPMD device mesh (replaces the reference's --ddp "
                           "launcher, main.py:39-49,1149-1156): 'auto' shards "
                           "over all global devices when more than one exists "
                           "(data,lat,channel factorization); 'none' forces "
                           "single-device; or explicit sizes 'DATA,LAT,CHANNEL' "
                           "e.g. --mesh 2,2,2")
    dist.add_argument("--coordinator-address", default=None,
                      help="multi-host coordinator host:port for "
                           "jax.distributed.initialize (the reference's "
                           "MASTER_ADDR/PORT, main.py:45-46); auto-detected "
                           "on TPU pods / SLURM when omitted")
    dist.add_argument("--num-processes", type=int, default=None)
    dist.add_argument("--process-id", type=int, default=None)

    film = p.add_argument_group("Architecture Film Gen")
    film.add_argument("--film-gen", dest="film_gen_type", default="gcn_custom",
                      choices=["gcn", "gcn_custom", "transformer", "mae", "none"])
    film.add_argument("--film-layers", type=int, default=1)
    film.add_argument("--film-compute-dtype", default="float32",
                      choices=["float32", "bfloat16"],
                      help="film-generator activation dtype; measured "
                      "2026-08-19: its bf16 drift DOMINATES the fast "
                      "tier's error (BASELINE.md tier ladder) — keep "
                      "fp32 for +6 ms/step and ~30%% less drift")
    film.add_argument("--repeat-film", action="store_true")
    film.add_argument("--model-depth", type=int, default=6)
    film.add_argument("--film-embed-dim", type=int, default=512)
    film.add_argument("--mlp-dim", type=int, default=512)
    film.add_argument("--temporal-step", type=int, default=28)
    film.add_argument("--patch-size", type=int, nargs=3, default=[28, 9, 9],
                      help="(t, h, w) patch for vit/mae film generators")
    film.add_argument("--coarse-level", type=int, default=4)
    film.add_argument("--nan-mask-threshold", type=float, default=0.5)
    film.add_argument("--scale-weight", type=float, default=1.0,
                      help="mae film-head init divisor (main.py:962)")
    return p


def postprocess_args(args, world_size: int = 1):
    """Derived-config munging replicated from the reference (main.py:115-136).

    - step-skip expansion: skipping k steps between supervised steps means the
      rollout must be (k+1)x longer to cover the same supervised horizon
      (main.py:115-124);
    - scheduler-horizon rescale: the flag is a horizon in samples; the
      reference divides by validation_interval*batch*(acc+1)*world because its
      scheduler steps once per validation (main.py:136).  Here the optax
      schedule advances once per optimizer update, so the divisor omits
      validation_interval — the total sample horizon covered is identical,
      the decay is smooth instead of a per-validation staircase.
    """
    if args.training_step_skip > 0:
        if args.multi_step_training > 0:
            args.multi_step_training += args.training_step_skip * args.multi_step_training
        else:
            log.warning("--training-step-skip given but --multi-step-training is 0")
    if args.validation_step_skip > 0:
        if args.multi_step_validation > 0:
            args.multi_step_validation += (
                args.validation_step_skip * args.multi_step_validation
            )
        else:
            log.warning("--validation-step-skip given but --multi-step-validation is 0")
    if args.scheduler != "none":
        args.scheduler_horizon = max(
            args.scheduler_horizon
            // (args.batch_size * (args.accumulation_steps + 1) * world_size),
            1,
        )
    return args


def parse_time_limit(value: str | None) -> float | None:
    """"HH:MM:SS" | "MM:SS" | seconds -> seconds (main.py:149-156)."""
    if value is None:
        return None
    parts = [float(x) for x in str(value).split(":")]
    secs = 0.0
    for part in parts:
        secs = secs * 60 + part
    return secs


def configs_from_args(args):
    from msfno_tpu.utils.config import FilmConfig, SFNOConfig, TrainConfig

    film = None
    if args.model_version == "film" or args.model == "mae":
        film = FilmConfig(
            film_gen_type=args.film_gen_type,
            film_layers=args.film_layers,
            repeat_film=args.repeat_film,
            model_depth=args.model_depth,
            embed_dim=args.film_embed_dim,
            mlp_dim=args.mlp_dim,
            temporal_step=args.temporal_step,
            patch_size=tuple(args.patch_size),
            coarse_level=args.coarse_level,
            sst_shape=(
                (args.img_size[0] - 1) // args.coarse_level,
                args.img_size[1] // args.coarse_level,
            ),
            nan_mask_threshold=args.nan_mask_threshold,
            num_film_features=args.embed_dim,
            scale_weight=args.scale_weight,
            dropout=args.dropout,
            cls_input=bool(args.cls),
            compute_dtype=args.film_compute_dtype,
            pallas_gcn=not args.no_pallas_gcn,
        )
    model_cfg = SFNOConfig(
        img_size=tuple(args.img_size),
        scale_factor=args.scale_factor,
        in_chans=args.in_chans,
        out_chans=args.out_chans,
        embed_dim=args.embed_dim,
        num_layers=args.num_layers,
        spectral_transform=args.spectral_transform,
        filter_type=args.filter_type,
        mlp_ratio=args.mlp_ratio,
        normalization_layer=args.normalization_layer,
        hard_thresholding_fraction=args.hard_thresholding_fraction,
        compression=args.compression,
        rank=args.rank,
        spectral_layers=args.spectral_layers,
        checkpointing_mlp=args.checkpointing_mlp,
        checkpointing_block=args.checkpointing_block,
        checkpointing_encoder=args.checkpointing_encoder,
        checkpointing_decoder=args.checkpointing_decoder,
        compute_dtype=args.compute_dtype,
        use_pallas=args.use_pallas,
        spectral_mxu_dtype=args.spectral_mxu_dtype,
        sht_mxu_dtype=args.sht_mxu_dtype,
        pallas_grid_mlp=args.pallas_grid_mlp,
        grid_mlp_mxu_dtype=args.grid_mlp_mxu_dtype,
        fuse_decoder_tail=not args.no_fuse_decoder_tail,
        fuse_encoder_dft=not args.no_fuse_encoder_dft,
        fuse_inner_mlp=args.fuse_inner_mlp,
        output_dtype=args.output_dtype,
        film=film,
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        optimizer=args.optimizer,
        weight_decay=args.weight_decay,
        scheduler=args.scheduler,
        scheduler_horizon=args.scheduler_horizon,
        loss_fn=args.loss_fn,
        multi_step_training=args.multi_step_training,
        training_step_skip=args.training_step_skip,
        discount_factor=args.discount_factor,
        accumulation_steps=args.accumulation_steps,
        validation_interval=args.validation_interval,
        validation_step_skip=args.validation_step_skip,
        multi_step_validation=args.multi_step_validation,
        save_checkpoint_interval=args.save_checkpoint_interval,
        training_epochs=args.training_epochs,
        film_scale_start=args.film_scale_start,
        retrain_film=args.retrain_film,
        seed=args.seed,
        time_limit_s=parse_time_limit(args.time_limit),
        scan_steps=(
            1 if str(args.scan_steps).lower() == "auto"
            else int(args.scan_steps)
        ),
        checkpoint_backend=args.checkpoint_backend,
        async_checkpoint=args.async_checkpoint,
        bf16_frozen_params=args.bf16_frozen_params,
        advanced_logging=args.advanced_logging,
    )
    if str(args.scan_steps).lower() == "auto":
        import dataclasses

        from msfno_tpu.training.trainer import auto_scan_steps

        train_cfg = dataclasses.replace(
            train_cfg, scan_steps=auto_scan_steps(model_cfg, train_cfg)
        )
    return model_cfg, train_cfg


def explicit_flags(argv=None) -> set[str]:
    """Dest names of the flags explicitly present on the command line.

    Re-parses argv with every default replaced by a sentinel, so
    `--flag=value` spellings, argparse prefix abbreviations, and
    programmatic main(argv=[...]) calls are all detected — naive
    sys.argv string matching misses all three."""
    p = build_parser()
    sentinel = object()
    for a in p._actions:
        a.default = sentinel
    ns, _ = p.parse_known_args(sys.argv[1:] if argv is None else argv)
    return {k for k, v in vars(ns).items() if v is not sentinel}


def merge_resume_config(model_cfg, args, argv=None):
    """Checkpoint-hyperparameter merge on resume: stored architecture wins
    unless the flag was explicitly passed (reference main.py:179-246)."""
    from msfno_tpu.training.checkpoint import peek
    from msfno_tpu.utils.config import from_json

    meta = peek(args.resume_checkpoint)
    stored = from_json(meta["config"])
    passed = explicit_flags(argv)
    protected = {"img_size", "scale_factor", "in_chans", "out_chans", "embed_dim",
                 "num_layers", "spectral_layers", "spectral_transform",
                 "filter_type", "normalization_layer"}
    import dataclasses

    overrides = {}
    for f in dataclasses.fields(type(stored)):
        if f.name in protected:
            continue  # architecture always comes from the checkpoint
        if f.name in passed:
            overrides[f.name] = getattr(model_cfg, f.name)
    return dataclasses.replace(stored, **overrides), meta


def build_backend(args):
    """--era5-path -> NpyBackend (directory of era5_*.npy) or ZarrBackend."""
    from msfno_tpu.data.era5 import NpyBackend, ZarrBackend

    path = args.era5_path
    if os.path.isdir(path) and any(
        f.startswith("era5_") for f in os.listdir(path)
    ):
        return NpyBackend(path)
    return ZarrBackend(path, sst_path=args.sst_path)


def build_loaders(args, model_cfg, train_cfg, argv=None):
    """--era5-path -> backend -> ERA5Dataset -> PrefetchLoader wiring
    (reference set_dataloader, train.py:448-521).  Returns
    (train_loader | None, val_loader_factory | None)."""
    if not args.era5_path or args.synthetic_data:
        return None, None
    from msfno_tpu.data.era5 import (
        ERA5Dataset,
        PrefetchLoader,
        year_range_indices,
    )

    backend = build_backend(args)
    n = len(backend)
    explicit = explicit_flags(argv)

    def year_window(y0, y1, flag_names):
        s, e = year_range_indices(args.dataset_start_year, y0, y1)
        # an EXPLICIT year range that doesn't fit the store must not
        # silently clamp or fall back to the whole store — training could
        # silently consume the validation years (VERDICT r2 weak #6).
        # Both ends are checked: a start past the store AND an end that
        # overruns or precedes it (the latter two used to clamp silently).
        if explicit & flag_names and (s >= n or s < 0 or e <= s or e > n):
            raise SystemExit(
                f"--{sorted(explicit & flag_names)[0].replace('_', '-')}: "
                f"year range {y0}-{y1} maps to steps [{s}, {e}] but the "
                f"store has {n}; fix the year flags or --dataset-start-year"
            )
        if s >= n:
            log.warning(
                "year range %d-%d starts past the store (%d of %d steps); "
                "using the full store", y0, y1, s, n,
            )
            return 0, None
        return s, min(e, n)

    film = model_cfg.film
    with_sst = film is not None and not film.cls_input
    common = dict(
        backend=backend,
        temporal_step=film.temporal_step if film else 28,
        with_sst=with_sst,
        past_sst=args.past_sst,
        dataset_start_year=args.dataset_start_year,
    )
    tr_s, tr_e = year_window(
        args.trainingset_start_year, args.trainingset_end_year,
        {"trainingset_start_year", "trainingset_end_year"},
    )
    va_s, va_e = year_window(
        args.validationset_start_year, args.validationset_end_year,
        {"validationset_start_year", "validationset_end_year"},
    )
    train_ds = ERA5Dataset(
        multi_step=train_cfg.multi_step_training,
        start_idx=tr_s, end_idx=tr_e, **common,
    )
    val_ds = ERA5Dataset(
        multi_step=train_cfg.multi_step_validation,
        start_idx=va_s, end_idx=va_e, **common,
    )
    transfer_dtype = None
    if args.input_transfer_dtype == "bfloat16":
        import jax.numpy as jnp

        transfer_dtype = jnp.bfloat16
    train_loader = PrefetchLoader(
        train_ds, batch_size=train_cfg.batch_size,
        shuffle=not args.no_shuffle,
        seed=args.seed, num_workers=args.training_workers,
        transfer_dtype=transfer_dtype,
    )
    val_prefetch = PrefetchLoader(
        val_ds,
        batch_size=args.batch_size_validation or train_cfg.batch_size,
        shuffle=False,
        num_workers=args.training_workers,
        transfer_dtype=transfer_dtype,
    )

    def val_factory():
        import itertools

        return itertools.islice(val_prefetch.epoch(0), args.validation_batches)

    return train_loader, val_factory


def resolve_mesh(args):
    """Build the CLI's SPMD mesh (the wiring the reference does with
    mp.spawn + ddp_setup behind --ddp, main.py:39-49,1149-1156).

    Called once per action that runs device work.  Bootstraps
    jax.distributed for multi-host environments first (idempotent,
    auto-detected unless --coordinator-address is given), then:
      --mesh none       -> None (single-device escape hatch)
      --mesh auto       -> make_mesh over all global devices when >1
                           (one chip keeps the unsharded fast path)
      --mesh D,L,C      -> explicit (data, lat, channel) sizes
    The returned mesh flows into Trainer (training/validation), rollout,
    and evaluation so every CLI workload shards the same way."""
    mesh_arg = (args.mesh or "auto").strip().lower()
    if mesh_arg == "none":
        return None
    from msfno_tpu.parallel.distributed import initialize_distributed
    from msfno_tpu.parallel.mesh import make_mesh

    initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import jax

    n = len(jax.devices())
    if mesh_arg != "auto":
        try:
            shape = tuple(int(x) for x in mesh_arg.split(","))
        except ValueError:
            shape = ()
        if len(shape) != 3 or any(s < 1 for s in shape):
            raise SystemExit(
                f"--mesh must be 'auto', 'none', or three comma-separated "
                f"sizes data,lat,channel (got {args.mesh!r})"
            )
        import math

        need = math.prod(shape)
        if need > n:
            raise SystemExit(
                f"--mesh {args.mesh} needs {need} devices but only {n} "
                f"are visible"
            )
        return make_mesh(need, shape=shape)
    if n > 1:
        # --mesh auto policy (deliberate, measured — BASELINE.md "Round-5
        # comm volume"): training with a real batch gets a DATA-MAJOR mesh
        # (the data axis carries no per-step all_to_all; gradient reduce is
        # cheap), batch-1 work gets the lat-first split (memory relief for
        # the 0.5-1 GB full-res activations + pos_embed).
        data_target = 1
        if getattr(args, "train", False):
            data_target = max(
                1, int(args.batch_size) * jax.process_count()
            )
        mesh = make_mesh(n, data_target=data_target)
        log.info("SPMD mesh over %d devices: %s", n, dict(mesh.shape))
        return mesh
    return None


def restore_train_state(state, trainer, args, model_cfg, train_cfg):
    """Resume semantics (reference main.py:179-246 + train.py:398-431):
    params always come from the checkpoint; optimizer state and schedule
    position only under --resume-optimizer/--resume-scheduler."""
    import dataclasses as dc

    import jax.numpy as jnp

    from msfno_tpu.training.checkpoint import load_checkpoint
    from msfno_tpu.training.partition import (
        film_trainable_predicate,
        split_params,
    )

    from msfno_tpu.models.convert import is_torch_checkpoint

    if is_torch_checkpoint(args.resume_checkpoint):
        # reference-format torch checkpoint: params-only restore through the
        # torch-free converter (the reference's own resume reads the same
        # {"model_state": ...} layout, main.py:179-246 + model.py:207-271);
        # torch optimizer moments cannot map onto optax state
        from msfno_tpu.models.convert import load_ecmwf_weights_tar
        from msfno_tpu.training.checkpoint import merge_film_checkpoint

        result = load_ecmwf_weights_tar(
            args.resume_checkpoint, num_layers=model_cfg.num_layers
        )
        if result["unconverted"]:
            log.warning("unconverted resume keys (ignored): %s",
                        result["unconverted"][:10])
        if args.resume_optimizer:
            log.warning("--resume-optimizer has no effect on a torch "
                        "checkpoint; optimizer state starts fresh")
        # OVERLAY onto the initialized tree (strict=False, like
        # registry.load_model / reference model.py:216-256): a backbone-only
        # weights.tar resumed into a filmed config must keep the freshly
        # initialized film generator, not drop it — a wholesale replace
        # would desync the param tree from the already-built opt_state
        init_full = merge_film_checkpoint(state.frozen or {}, state.trainable)
        params, opt_state, meta = (
            merge_film_checkpoint(init_full, result["params"]), None, {},
        )
    else:
        params, opt_state, meta = load_checkpoint(
            args.resume_checkpoint,
            opt_state_template=state.opt_state if args.resume_optimizer else None,
        )
    if model_cfg.film is not None:
        pred = film_trainable_predicate(train_cfg.retrain_film, model_cfg.num_layers)
        tr_p, fr_p = split_params(params, pred)
    else:
        tr_p, fr_p = params, {}
    if train_cfg.bf16_frozen_params and fr_p:
        from msfno_tpu.inference.rollout import serving_params

        fr_p = serving_params(fr_p)
    state = dc.replace(
        state,
        trainable=tr_p,
        frozen=fr_p,
        step=jnp.asarray(meta.get("step", 0), jnp.int32),
        film_scale=jnp.asarray(
            meta.get("film_scale", train_cfg.film_scale_start), jnp.float32
        ),
    )
    if args.resume_optimizer and opt_state is not None:
        state = dc.replace(state, opt_state=opt_state)
    elif args.resume_scheduler:
        # fast-forward ONLY the LR-schedule position; adam's bias-correction
        # count must stay 0 with fresh (zero) moments (optim.py)
        from msfno_tpu.training.optim import fast_forward_schedule

        state = dc.replace(
            state,
            opt_state=fast_forward_schedule(
                state.opt_state, meta.get("step", 0)
            ),
        )
    trainer.iter = int(meta.get("step", 0))
    trainer.epoch = int(meta.get("epoch", 0))
    # the next train() call continues AFTER the checkpoint's epoch: our meta
    # stores the 0-based epoch just completed, the reference stores the
    # completed-epoch COUNT and resumes its while-loop there (train.py:53-66,
    # 308) — both mean "start at the next epoch"
    trainer.start_epoch = trainer.epoch + 1 if "epoch" in meta else 0
    return state


def _force_cpu_backend():
    """Re-point jax at the host CPU before any backend initializes
    (reference --cpu, main.py; here it also keeps every CLI flow usable
    when the remote-TPU tunnel is down).  Safe to call early: with no
    live backend, clear_backends() is a no-op and the config update is
    consumed lazily at first device use."""
    import jax

    try:
        import jax._src.xla_bridge as xb

        if xb._backends and jax.default_backend() == "cpu":
            return  # already on CPU (e.g. the test session) — don't reset
    except Exception:
        pass
    from jax.extend.backend import clear_backends

    clear_backends()
    # config update only — mutating os.environ["JAX_PLATFORMS"] would leak
    # past this run for in-process callers (tests), and the axon
    # sitecustomize overrides the env var anyway
    jax.config.update("jax_platforms", "cpu")
    n = os.environ.get("MSFNO_CPU_DEVICES")
    if n:
        # virtual CPU devices for pod simulation (the two-process CLI test
        # gives each process 4, making an 8-device global mesh)
        jax.config.update("jax_num_cpu_devices", int(n))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.profile_dir:
        return _main(args, argv)
    # --profile-dir: wrap the whole action in a jax/XLA profiler trace
    # (TensorBoard-loadable; the reference has no profiler at all).
    # Start/stop failures degrade to a warning — some backends (e.g. the
    # remote-tunnel platform) may not support tracing.
    started = False
    try:
        import jax

        jax.profiler.start_trace(args.profile_dir)
        started = True
    except Exception as e:
        log.warning("profiler trace unavailable: %s", e)
    try:
        return _main(args, argv)
    finally:
        if started:
            try:
                import jax

                jax.profiler.stop_trace()
                log.info("profiler trace written to %s", args.profile_dir)
            except Exception as e:
                log.warning("profiler stop_trace failed: %s", e)


def _main(args, argv=None) -> int:
    if args.cpu:
        _force_cpu_backend()
    try:
        # persistent XLA compile cache: repeat CLI invocations skip the slow
        # full-model compile (~40-60 s per tier on a TPU; keyed per backend)
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("MSFNO_COMPILE_CACHE", "/root/.cache/jax_comp"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # unknown config on old jax — never block the CLI
        pass
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        filename=args.log_file,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    t0 = time.time()

    # NOTE on --debug: the reference enables torch.autograd.set_detect_anomaly
    # (main.py:71), which traps NaNs in BACKWARD gradients only.  The tempting
    # JAX analogue, jax_debug_nans, raises on every op output — and this
    # pipeline's SST fields legitimately carry NaN over land until the film
    # generators mask them, so it false-positives on correct data.  --debug
    # therefore means verbose logging here; for a gradient NaN hunt, set
    # JAX_DEBUG_NANS=1 on a synthetic (NaN-free) run instead.
    from msfno_tpu.parallel.distributed import world_size_hint

    args = postprocess_args(args, world_size=world_size_hint())
    model_cfg, train_cfg = configs_from_args(args)
    from msfno_tpu.models.convert import is_torch_checkpoint

    if args.resume_checkpoint and not is_torch_checkpoint(args.resume_checkpoint):
        # reference torch checkpoints carry no config JSON — architecture
        # comes from the CLI flags (docs/REAL_WEIGHTS.md §3); the converter
        # still errors on a block-count mismatch, so this cannot silently
        # run the wrong architecture
        model_cfg, _ = merge_resume_config(model_cfg, args, argv=argv)

    from msfno_tpu.models import get_model

    os.makedirs(args.output_path, exist_ok=True)

    if args.dump_provenance:
        from msfno_tpu.utils.observability import dump_provenance

        path = dump_provenance(os.path.join(args.output_path, "provenance.json"))
        log.info("provenance written to %s", path)

    wrapper = get_model(args.model, args.model_version, cfg=model_cfg,
                        assets=args.assets)

    if args.film_weights:
        # merge film-generator weights onto the backbone (reference
        # film-checkpoint merge, sfno/model.py:909-912, 983-1005)
        from msfno_tpu.training.checkpoint import (
            load_checkpoint as _load_cp,
            merge_film_checkpoint,
        )

        if wrapper.params is None:
            wrapper.init_params()
        film_params, _, _ = _load_cp(args.film_weights)
        film_only = {k: v for k, v in film_params.items()
                     if k in ("film_gen", "film_head")}
        wrapper.params = merge_film_checkpoint(wrapper.params, film_only)

    if args.train and args.model == "mae" and args.model_version == "lin-probe":
        # linear probe: ridge-fit precomputed MAE cls tokens -> ONI index
        # (reference Linear_probing, mae/model.py:177-276; --cls/--oni-path
        # inputs main.py:554-562; baselines LinearProbingMAE.ipynb)
        import numpy as np

        if not (args.cls and args.oni_path):
            log.error("lin-probe needs --cls and --oni-path .npy files")
            return 1
        cls_tokens = np.load(args.cls)
        oni = np.load(args.oni_path).reshape(-1)
        n = min(len(cls_tokens), len(oni))
        cls_tokens, oni = cls_tokens[:n], oni[:n]
        if n < 2:
            log.error("lin-probe needs >= 2 samples (got %d) for a "
                      "train/test split", n)
            return 1
        split = min(max(int(n * 0.8), 1), n - 1)
        wrapper.fit(cls_tokens[:split], oni[:split])
        mae = wrapper.mae_metric(cls_tokens[split:], oni[split:])
        clim = float(np.mean(np.abs(oni[split:] - np.mean(oni[:split]))))
        wrapper.save_checkpoint(
            os.path.join(args.output_path, "checkpoint_linprobe.npz")
        )
        print(json.dumps({"lin_probe_mae": mae, "climatology_mae": clim}))
        return 0

    if args.train and args.model == "mae" and args.model_version != "lin-probe":
        # MAE SST pretraining (reference mae --train, train.py:318-339):
        # stochastic-mask CRPS reconstruction over SST history windows
        import numpy as np

        from msfno_tpu.utils.observability import create_writer

        f = model_cfg.film

        def sst_batches():
            if args.sst_path or args.era5_path:
                # SST-only reads: works on a pure-SST store (no era5_*.npy)
                # and never pays 73-channel ERA5 loads it would discard
                from msfno_tpu.data.sst import SSTNpyStore

                store = SSTNpyStore(
                    args.sst_path or args.era5_path,
                    temporal_step=f.temporal_step,
                )
                yield from store.batches(
                    train_cfg.batch_size,
                    epochs=train_cfg.training_epochs,
                    seed=args.seed,
                )
            else:
                from msfno_tpu.data.synthetic import synthetic_sst

                rng = np.random.default_rng(args.seed)
                for _ in range(args.num_iterations):
                    yield synthetic_sst(
                        rng, train_cfg.batch_size, f.temporal_step, *f.sst_shape
                    )

        writer = create_writer(
            save_dir=args.output_path, use_wandb=args.wandb,
            project=f"{args.model}-{args.model_version}",
            resume_id=args.wandb_resume,
        )
        params, losses = wrapper.pretrain(
            sst_batches(),
            learning_rate=train_cfg.learning_rate,
            seed=args.seed,
            writer=writer,
        )
        wrapper.save_checkpoint(
            os.path.join(args.output_path, "checkpoint_mae_final.npz")
        )
        writer.save("_mae")
        log.info("mae pretraining done: final crps %.5f", losses[-1])
        return 0

    if args.train or args.test_performance or args.test_batch_size:
        from msfno_tpu.utils.observability import create_writer

        mesh = resolve_mesh(args)
        trainer = wrapper.trainer(
            train_cfg,
            checkpoint_dir=args.output_path,
            mesh=mesh,
            writer=create_writer(
                save_dir=args.output_path, use_wandb=args.wandb,
                project=f"{args.model}-{args.model_version}",
                resume_id=args.wandb_resume,
            ),
        )
        if args.test_batch_size:
            if args.batch_size_step > 0:
                # reference grows linearly by batch_size_step until OOM
                # (train.py:1296-1337)
                cands = tuple(
                    args.batch_size_step * k for k in range(1, 17)
                )
                best = trainer.test_batch_size(cands)
            else:
                best = trainer.test_batch_size()
            print(json.dumps({"max_batch_size": best}))
            return 0
        state = trainer.init_state()
        if args.sfno_weights:
            # pretrained backbone for film fine-tuning (reference
            # sfno-weights, main.py:410 + load path sfno/model.py:207-271):
            # backbone params come from the checkpoint, the film generator
            # keeps its fresh init, and the usual trainable/frozen split
            # applies on the merged tree
            import dataclasses as _dc

            from msfno_tpu.training.partition import (
                film_trainable_predicate,
                merge_params,
                split_params,
            )

            # load ONLY the stored/converted weights — wrapper.load_model
            # would init_params() a second full tree (seconds + a duplicate
            # multi-GB host copy at full size) and its fresh film init would
            # overwrite the trainer state's film init on the overlay below
            from msfno_tpu.models.convert import is_torch_checkpoint

            if is_torch_checkpoint(args.sfno_weights):
                from msfno_tpu.models.convert import load_ecmwf_weights_tar

                result = load_ecmwf_weights_tar(
                    args.sfno_weights, num_layers=model_cfg.num_layers
                )
                if result["unconverted"]:
                    log.warning(
                        "unconverted sfno-weights keys (strict=False): %s",
                        result["unconverted"][:10],
                    )
                backbone = result["params"]
            else:
                from msfno_tpu.training.checkpoint import (
                    load_checkpoint as _load_sfno,
                )

                backbone, _, _ = _load_sfno(args.sfno_weights)
            full = merge_params(state.trainable, state.frozen)
            # overlay backbone keys onto the fresh tree (film generator
            # keys absent from a pure-SFNO checkpoint keep their init),
            # then re-split trainable/frozen
            from flax import traverse_util as _tu

            flat = dict(_tu.flatten_dict(full))
            flat.update(_tu.flatten_dict(backbone))
            full = _tu.unflatten_dict(flat)
            if model_cfg.film is not None:
                pred = film_trainable_predicate(
                    train_cfg.retrain_film, model_cfg.num_layers
                )
                tr_p, fr_p = split_params(full, pred)
            else:
                tr_p, fr_p = full, {}
            state = _dc.replace(state, trainable=tr_p, frozen=fr_p)
        if args.resume_checkpoint:
            state = restore_train_state(state, trainer, args, model_cfg, train_cfg)
        if mesh is not None and (args.sfno_weights or args.resume_checkpoint):
            # overlay/restore replaced leaves with host arrays — put the
            # state back on the mesh with its canonical param shardings
            from msfno_tpu.parallel.sharded_train import shard_state

            state = shard_state(state, mesh)
        if args.set_epoch is not None:
            trainer.start_epoch = args.set_epoch
        if args.test_performance:
            sec = trainer.test_model_speed(state)
            print(json.dumps({"model_fwd_s": sec}))
            return 0
        train_loader, val_factory = build_loaders(args, model_cfg, train_cfg, argv)
        trainer.train(
            state,
            loader=train_loader,
            val_loader=val_factory,
            num_batches=args.num_iterations,
        )
        log.info("training done in %.1fs", time.time() - t0)
        return 0

    if args.save_forecast:
        # weatherbench2-format forecast dump (reference main.py:298 ->
        # Trainer.save_forecast, train.py:942-1110)
        import numpy as np

        from msfno_tpu.training.trainer import save_forecast as save_forecast_fn

        trainer = wrapper.trainer(train_cfg, mesh=resolve_mesh(args))
        state = trainer.init_state()
        if args.resume_checkpoint:
            state = restore_train_state(state, trainer, args, model_cfg, train_cfg)
        _, val_factory = build_loaders(args, model_cfg, train_cfg, argv)
        if val_factory is not None:
            batches = list(val_factory())
        else:
            from msfno_tpu.data.synthetic import gen_batch

            steps_needed = max(train_cfg.multi_step_validation, 1)
            batches = [
                gen_batch(model_cfg, train_cfg.batch_size, steps_needed, seed=i)
                for i in range(args.num_iterations)
            ]
        out = save_forecast_fn(
            trainer,
            state,
            batches,
            steps=max(train_cfg.multi_step_validation, 1),
            out_path=os.path.join(args.output_path, "forecast_store"),
            channels=list(getattr(wrapper, "ordering", [])) or None,
        )
        log.info("forecast archive written to %s", out)
        return 0

    if args.eval_model:
        # checkpoint skill evaluation (reference main.py:303-337 ->
        # evaluate_model, sfno/model.py:1292-1486)
        import numpy as np

        from msfno_tpu.inference.eval_checkpoints import (
            evaluate_checkpoints,
            select_checkpoints,
        )

        cps = args.checkpoint_list or select_checkpoints(
            os.path.join(args.output_path, "checkpoint_*")
        )
        if not cps:
            log.error("no checkpoints to evaluate (--checkpoint-list or "
                      "checkpoint_* .npz/orbax under --output-path)")
            return 1
        _, val_factory = build_loaders(args, model_cfg, train_cfg, argv)
        if val_factory is not None:
            batches = list(val_factory())
        else:
            from msfno_tpu.data.synthetic import gen_batch

            batches = [
                gen_batch(
                    model_cfg, train_cfg.batch_size,
                    max(train_cfg.multi_step_validation, 1), seed=100 + i,
                )
                for i in range(2)
            ]
        if args.climatology_path:
            clim = np.load(args.climatology_path)
        else:
            log.warning("no --climatology-path; using the batch time-mean as "
                        "the skill reference")
            clim = np.mean(
                np.stack([b.era5 for b in batches]), axis=(0, 1, 2)
            )
        reports = evaluate_checkpoints(
            wrapper.module,
            cps,
            batches,
            climatology=clim,
            steps=max(train_cfg.multi_step_validation, 1),
            normalizer=wrapper.normalizer,
            sst_normalizer=wrapper.sst_normalizer,
            save_path=os.path.join(args.output_path, "eval"),
            include_sfno_baseline=args.eval_sfno,
            mesh=resolve_mesh(args),
        )
        for name, rep in reports.items():
            log.info("%s: mean skill %.4f", name, float(np.mean(rep.skill)))
        return 0

    if args.run:
        import numpy as np

        if not 0 <= args.time < 24:
            # migration footgun: the reference's --time is HHMM (1200 =
            # noon); here it is the HOUR.  Silently wrapping 1200 % 24 = 0
            # would run the wrong initial condition without a trace.
            raise SystemExit(
                f"--time takes an hour 0-23 (got {args.time}); the "
                f"reference's HHMM format is not accepted — e.g. pass "
                f"--time 12 for the reference's --time 1200"
            )
        if wrapper.params is None:
            wrapper.load_model(args.resume_checkpoint)
        h, w = model_cfg.img_size
        store_backend = None
        store_idx = 0
        if args.era5_path and (
            os.path.isdir(args.era5_path)
            or args.era5_path.rstrip("/").endswith(".zarr")
        ):
            # store directory (same form --train accepts): initial condition
            # selected by --date/--time, defaulting to the first step
            from msfno_tpu.data.era5 import yyyymmddhh_to_index

            store_backend = build_backend(args)
            if args.date:
                store_idx = yyyymmddhh_to_index(
                    args.dataset_start_year,
                    int(args.date) * 100 + args.time,  # hour validated above
                )
                if not (0 <= store_idx < len(store_backend)):
                    log.error(
                        "--date %s --time %02d is outside the store "
                        "(index %d of %d)", args.date, args.time,
                        store_idx, len(store_backend),
                    )
                    return 1
            x0 = store_backend.era5(store_idx)[None]
        elif args.era5_path:
            x0 = np.load(args.era5_path)  # single np.load-able array
        else:
            log.warning("no --era5-path; running from random initial condition")
            x0 = np.random.randn(1, h, w, model_cfg.in_chans).astype(np.float32)
        sst_seq = None
        if model_cfg.film is not None:
            steps = args.lead_time // 6
            f = model_cfg.film
            if args.sst_path and not os.path.isdir(args.sst_path):
                sst_seq = np.load(args.sst_path)
            elif store_backend is not None and store_backend.sst(store_idx) is not None:
                # per-step SST windows from the store, built with the exact
                # training-time convention (trainer feeds window index
                # step+1; era5.rollout_sst_window_start).  Windows outside
                # the store are an ERROR — the old silent edge clamp reused
                # boundary frames and scrambled the film conditioning
                from msfno_tpu.data.era5 import rollout_sst_window_start

                T = f.temporal_step
                starts = [
                    rollout_sst_window_start(store_idx, s, T, args.past_sst)
                    for s in range(steps)
                ]
                lo, hi = starts[0], starts[-1] + T - 1
                if lo < 0 or hi >= len(store_backend):
                    raise SystemExit(
                        f"--lead-time {args.lead_time} from store index "
                        f"{store_idx} needs SST frames [{lo}, {hi}] but the "
                        f"store has [0, {len(store_backend) - 1}]; shorten "
                        f"--lead-time, pick another --date, toggle "
                        f"--past-sst, or supply --sst-path"
                    )
                sst_seq = np.stack([
                    np.stack([
                        store_backend.sst(w0 + k) for k in range(T)
                    ])
                    for w0 in starts
                ])[:, None]  # (steps, B=1, T, Hs, Ws)
            else:
                log.warning("filmed model without --sst-path; synthetic SST")
                from msfno_tpu.data.synthetic import synthetic_land_mask

                sst_seq = np.random.randn(
                    steps, 1, f.temporal_step, *f.sst_shape
                ).astype(np.float32)
                sst_seq[..., synthetic_land_mask(*f.sst_shape)] = np.nan
        writer = None
        if (args.hindcast or args.hindcast_reference_year is not None) and \
                args.output not in ("file", "netcdf"):
            log.warning(
                "--hindcast relabeling applies to step-writing outputs only; "
                "pass --output file or --output netcdf (got %r)", args.output
            )
        if args.output in ("file", "netcdf"):
            from msfno_tpu.inference.io import get_output

            variables = None
            if args.output_variables:
                variables = json.loads(open(args.output_variables).read())
            writer = get_output(
                args.output,
                path=os.path.join(args.output_path, "forecast"),
                ordering=list(getattr(wrapper, "ordering", [])) or None,
                variables=variables,
            )
            if args.hindcast or args.hindcast_reference_year is not None:
                from msfno_tpu.inference.io import HindcastReLabel

                ref_year = args.hindcast_reference_year or (
                    int(args.date[:4]) if args.date else 2020
                )
                start = int(args.date) if args.date else ref_year * 10000 + 101
                writer = HindcastReLabel(
                    None, writer,
                    reference_date=ref_year * 10000 + start % 10000,
                    hdate=start,
                )
        outs = []
        for field in wrapper.running(x0, lead_time_h=args.lead_time,
                                     sst_seq=sst_seq, output=writer,
                                     mesh=resolve_mesh(args)):
            outs.append(field)
        if args.output == "npz":
            out_file = os.path.join(args.output_path, "forecast.npz")
            np.savez(out_file, forecast=np.stack(outs))
            log.info("forecast written to %s", out_file)
        return 0

    if args.test_dataloader_speed:
        trainer = wrapper.trainer(train_cfg)
        train_loader, _ = build_loaders(args, model_cfg, train_cfg, argv)
        if train_loader is not None:
            it = train_loader.epoch(0)
        else:
            from msfno_tpu.data.synthetic import synthetic_loader

            it = synthetic_loader(model_cfg, train_cfg.batch_size, 0, 10)
        sec = trainer.test_dataloader_speed(it)
        print(json.dumps({"dataloader_s_per_batch": sec}))
        return 0

    if args.save_data:
        trainer = wrapper.trainer(train_cfg)
        train_loader, _ = build_loaders(args, model_cfg, train_cfg, argv)
        if train_loader is not None:
            it = train_loader.epoch(0)
        else:
            from msfno_tpu.data.synthetic import synthetic_loader

            it = synthetic_loader(
                model_cfg, train_cfg.batch_size, train_cfg.multi_step_training,
                args.num_iterations,
            )
        out = trainer.save_data(
            it,
            os.path.join(args.output_path, "data"),
            num_batches=args.num_iterations,
        )
        log.info("batches written to %s", out)
        return 0

    build_parser().print_help()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
