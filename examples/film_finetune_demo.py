#!/usr/bin/env python
"""End-to-end film fine-tune demo with a REAL skill signal.

Closes the reference's scientific loop (pretrained SFNO backbone -> frozen
-> film-generator fine-tune on SST -> filmed model beats the scale-0 SFNO
baseline; MSFNO/Models/sfno/model.py:1346-1354 + main.py --sfno-weights
film fine-tuning, main.py:410) without any real ERA5/ORAS5 data:

1. generate SST-coupled synthetic dynamics (data/synthetic.py
   gen_coupled_batches) in which the next state has a component that is
   *unpredictable from the state alone* but readable from the SST window;
2. pretrain a plain SFNO backbone on those dynamics;
3. overlay the backbone into a filmed model (the CLI --sfno-weights path),
   freeze it (the Trainer's default filmed split), fine-tune only the film
   generator;
4. evaluate both with the reference's skill-vs-climatology protocol
   (inference/eval_checkpoints.py, include_sfno_baseline=True) and ASSERT
   skill(filmed) > skill(scale-0 baseline).

Run: python examples/film_finetune_demo.py [--out ./film_demo_out] [--quick]
(CPU-friendly: ~2 min full, ~40 s --quick.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def run(out_dir: str, quick: bool = False, seed: int = 0) -> dict:

    from msfno_tpu.data.synthetic import gen_coupled_batches
    from msfno_tpu.inference.eval_checkpoints import evaluate_checkpoints
    from msfno_tpu.models import (
        FourierNeuralOperatorNet,
        FourierNeuralOperatorNetFilmed,
    )
    from msfno_tpu.training.partition import (
        film_trainable_predicate,
        merge_params,
        split_params,
    )
    from msfno_tpu.training.checkpoint import merge_film_checkpoint
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import FilmConfig, SFNOConfig, TrainConfig

    kw = dict(
        img_size=(32, 64),
        scale_factor=2,
        in_chans=4,
        out_chans=4,
        embed_dim=16,
        num_layers=2,
        spectral_layers=2,
    )
    film = FilmConfig(
        film_gen_type="gcn",  # zero-init film head: film starts as an exact
        # identity (gcn/gcn.py:12-91 head zero-init), so fine-tuning is pure
        # gain; gcn_custom's ones-init head needs the reference's slow
        # film-scale ramp from 0 to stay stable (train.py:638-641)
        model_depth=2,
        embed_dim=32,
        mlp_dim=32,
        num_film_features=16,
        sst_shape=(16, 32),
        temporal_step=3,
    )
    cfg_plain = SFNOConfig(**kw)
    cfg_filmed = SFNOConfig(film=film, **kw)
    n_pre, n_ft = (40, 60) if quick else (120, 200)
    os.makedirs(out_dir, exist_ok=True)

    # ---- phase 1: pretrain the plain SFNO backbone on the coupled dynamics
    print(f"[1/3] pretraining plain SFNO backbone ({n_pre} steps)...")
    tcfg_pre = TrainConfig(
        batch_size=2, validation_interval=0, training_epochs=1, learning_rate=2e-3
    )
    pre_batches = gen_coupled_batches(
        cfg_filmed, n_pre, batch_size=2, seed=seed, coupling=2.0, decay=0.8
    )
    trainer_pre = Trainer(cfg_plain, tcfg_pre, checkpoint_dir=out_dir)
    # the plain model ignores sst; feed the same batches minus the sst field
    import dataclasses as _dc

    plain_batches = [_dc.replace(b, sst=None) for b in pre_batches]
    state_pre = trainer_pre.train(
        trainer_pre.init_state(), plain_batches, num_batches=n_pre
    )
    backbone = dict(state_pre.trainable)

    # ---- phase 2: film fine-tune with the frozen pretrained backbone
    print(f"[2/3] film fine-tuning (frozen backbone, {n_ft} steps)...")
    tcfg_ft = TrainConfig(
        batch_size=2,
        validation_interval=0,
        training_epochs=1,
        learning_rate=1e-2,
        film_scale_start=1.0,
    )
    trainer_ft = Trainer(cfg_filmed, tcfg_ft, checkpoint_dir=out_dir)
    state_ft = trainer_ft.init_state()
    # overlay backbone keys onto the fresh filmed tree (exactly the CLI
    # --sfno-weights path, cli.py), then re-split trainable/frozen
    full = merge_film_checkpoint(
        merge_params(state_ft.trainable, state_ft.frozen), backbone
    )
    pred = film_trainable_predicate(False, cfg_filmed.num_layers)
    tr_p, fr_p = split_params(full, pred)
    state_ft = _dc.replace(state_ft, trainable=tr_p, frozen=fr_p)

    ft_batches = gen_coupled_batches(
        cfg_filmed, n_ft, batch_size=2, seed=seed + 10_000,
        coupling=2.0, decay=0.8,
    )
    state_ft = trainer_ft.train(state_ft, ft_batches, num_batches=n_ft)
    cp = trainer_ft.save_checkpoint(state_ft)
    print(f"  checkpoint: {cp}")

    # ---- phase 3: skill vs climatology, filmed vs the scale-0 SFNO baseline
    print("[3/3] evaluating skill vs climatology (filmed vs scale-0)...")
    steps = 2
    eval_batches = gen_coupled_batches(
        cfg_filmed, 4, batch_size=2, multi_step=steps - 1,
        seed=seed + 20_000, coupling=2.0, decay=0.8,
    )
    clim = np.zeros(cfg_filmed.img_size + (cfg_filmed.in_chans,), np.float32)
    module = FourierNeuralOperatorNetFilmed(cfg_filmed)
    reports = evaluate_checkpoints(
        module, [cp], eval_batches, clim, steps,
        save_path=os.path.join(out_dir, "eval"),
        include_sfno_baseline=True,
    )
    (base_name, base), (film_name, filmed) = sorted(
        reports.items(), key=lambda kv: "@scale0" not in kv[0]
    )
    s_base = float(np.mean(base.skill))
    s_film = float(np.mean(filmed.skill))
    print(f"  {base_name}: mean skill {s_base:+.4f}  "
          f"(MSE {float(np.mean(base.mse_model)):.4f})")
    print(f"  {film_name}: mean skill {s_film:+.4f}  "
          f"(MSE {float(np.mean(filmed.mse_model)):.4f})")
    assert s_film > s_base, (
        f"film fine-tune failed to beat the scale-0 SFNO baseline: "
        f"{s_film:.4f} <= {s_base:.4f}"
    )
    print(f"  => film conditioning adds {s_film - s_base:+.4f} skill "
          f"(arrays + plots under {out_dir}/eval/)")
    return {"skill_filmed": s_film, "skill_baseline": s_base}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./film_demo_out")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    run(args.out, quick=args.quick)


if __name__ == "__main__":
    main()
