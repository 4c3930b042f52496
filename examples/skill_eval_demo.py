#!/usr/bin/env python
"""End-to-end skill-evaluation demo on synthetic data.

Reproduces the reference's acceptance-test workflow
(evaluation/Skill_SFNO_vs_FCN.ipynb + FourCastNetv2_filmed.evaluate_model):
train a tiny filmed SFNO briefly, checkpoint it, roll out, and score skill
vs a climatology — everything self-contained, no data on disk.

Run: python examples/skill_eval_demo.py [--out ./demo_out]
"""

from __future__ import annotations

import os
import sys

# runnable as `python examples/<demo>.py` from anywhere: make the repo root
# importable without requiring an installed package or PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./demo_out")
    args = p.parse_args()

    from msfno_tpu.data.synthetic import gen_batch
    from msfno_tpu.inference.eval_checkpoints import evaluate_checkpoints
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import FilmConfig, SFNOConfig, TrainConfig

    cfg = SFNOConfig(
        img_size=(32, 64),
        scale_factor=2,
        in_chans=4,
        out_chans=4,
        embed_dim=16,
        num_layers=3,
        spectral_layers=2,
        film=FilmConfig(
            film_gen_type="gcn_custom",
            model_depth=2,
            embed_dim=32,
            mlp_dim=32,
            num_film_features=16,
            sst_shape=(16, 32),
            temporal_step=4,
        ),
    )
    tcfg = TrainConfig(
        batch_size=1, validation_interval=0, training_epochs=1,
        film_scale_start=1.0,
    )
    os.makedirs(args.out, exist_ok=True)

    print("training briefly on synthetic data...")
    trainer = Trainer(cfg, tcfg, checkpoint_dir=args.out)
    state = trainer.train(trainer.init_state(), num_batches=5)
    cp = trainer.save_checkpoint(state)
    print(f"checkpoint: {cp}")

    print("evaluating skill vs climatology...")
    steps = 3
    batches = [gen_batch(cfg, 1, steps, seed=100 + i) for i in range(2)]
    clim = np.zeros(cfg.img_size + (cfg.in_chans,), np.float32)
    module = FourierNeuralOperatorNetFilmed(cfg)
    reports = evaluate_checkpoints(
        module, [cp], batches, clim, steps,
        save_path=os.path.join(args.out, "eval"),
        include_sfno_baseline=True,
    )
    for name, rep in reports.items():
        print(f"  {name}: mean skill {np.mean(rep.skill):+.4f}, "
              f"mean MSE {np.mean(rep.mse_model):.4f}")
    print(f"arrays + plots under {args.out}/eval/")


if __name__ == "__main__":
    main()
