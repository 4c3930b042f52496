"""Checkpoint-list skill evaluation (reference --eval-model path:
main.py:303-337 selects an equidistant checkpoint subset;
FourCastNetv2_filmed.evaluate_model, sfno/model.py:1292-1486, rolls each out
against validation data, computes per-variable MSE in real & normalized
space and skill vs climatology, then saves arrays + PDF plots).
"""

from __future__ import annotations

import glob
import logging
import os

import jax.numpy as jnp
import numpy as np

from msfno_tpu.data.normalization import Normalizer
from msfno_tpu.inference.evaluate import SkillReport, evaluate_rollout
from msfno_tpu.inference.rollout import scan_rollout
from msfno_tpu.training.checkpoint import load_checkpoint

log = logging.getLogger("msfno_tpu")


from msfno_tpu.models.convert import (  # noqa: F401  (re-export)
    TORCH_CHECKPOINT_SUFFIXES,
    is_torch_checkpoint,
)


def load_eval_params(path: str, num_layers: int) -> tuple[dict, dict]:
    """(params, meta) from any supported checkpoint format.

    Native .npz / orbax directories load directly; reference torch
    checkpoints (the ECMWF ``weights.tar``, reference Trainer saves —
    sfno/model.py:207-271) convert on the fly through the torch-free
    reader, which makes ``--eval-model --checkpoint-list weights.tar``
    the one-command real-weights protocol (docs/REAL_WEIGHTS.md)."""
    if is_torch_checkpoint(path):
        from msfno_tpu.models.convert import load_ecmwf_weights_tar

        out = load_ecmwf_weights_tar(path, num_layers=num_layers)
        if out["unconverted"]:
            log.warning(
                "eval: %d unconverted keys in %s (ignored): %s",
                len(out["unconverted"]), path, out["unconverted"][:10],
            )
        return out["params"], {}
    params, _, meta = load_checkpoint(path)
    return params, meta


def _checkpoint_sort_key(path: str) -> tuple:
    """Numeric (iter, epoch) from 'checkpoint_iter={i}_epoch={e}...' names.
    The trainer writes UNPADDED ints (trainer.py save_checkpoint), so a
    lexicographic sort puts iter=100 before iter=20 and scrambles the
    equidistant subset; unparseable names sort last, by name."""
    import re

    m = re.search(r"iter=(\d+)", os.path.basename(path))
    e = re.search(r"epoch=(\d+)", os.path.basename(path))
    if m:
        return (0, int(m.group(1)), int(e.group(1)) if e else 0, path)
    return (1, 0, 0, path)


def select_checkpoints(pattern: str, max_count: int = 5) -> list[str]:
    """Equidistant subset of matching checkpoints (reference main.py:305-322),
    ordered by training iteration.  Matches .npz files and orbax
    checkpoint directories."""
    from msfno_tpu.training.checkpoint import is_orbax_dir

    files = sorted(
        (f for f in glob.glob(pattern)
         if f.endswith(".npz") or is_orbax_dir(f)),
        key=_checkpoint_sort_key,
    )
    if len(files) <= max_count:
        return files
    idx = np.linspace(0, len(files) - 1, max_count).round().astype(int)
    return [files[i] for i in sorted(set(idx))]


def evaluate_checkpoints(
    module,
    checkpoint_files: list[str],
    batches,
    climatology: np.ndarray,
    steps: int,
    normalizer: Normalizer | None = None,
    sst_normalizer=None,
    save_path: str | None = None,
    film_scales: dict[str, float] | None = None,
    include_sfno_baseline: bool = False,
    mesh=None,
) -> dict[str, SkillReport]:
    """Roll out each checkpoint over `batches` and score skill vs climatology.

    batches: iterable of Batch with era5 (S >= steps+1, B, H, W, C).
    With include_sfno_baseline, the first checkpoint is also evaluated at
    film scale 0 — the pure-SFNO reference (--eval-sfno, model.py:1346-1354).
    With a mesh, every rollout runs SPMD (the full-resolution skill eval is
    exactly the memory-bound workload the lat-sharded SHT targets,
    reference model.py:1292-1486).
    """
    # materialize: the runs loop iterates `batches` once per checkpoint, so a
    # one-shot generator would evaluate only the first run and leave the rest
    # with zero batches (np.concatenate on [] crashes)
    batches = list(batches)
    if not batches:
        raise ValueError("evaluate_checkpoints: no validation batches")
    normalizer = normalizer or Normalizer.identity(
        batches[0].era5.shape[-1]
    )
    reports: dict[str, SkillReport] = {}

    runs = [(cp, None) for cp in checkpoint_files]
    if include_sfno_baseline and checkpoint_files:
        runs.insert(0, (checkpoint_files[0], 0.0))

    num_layers = getattr(getattr(module, "cfg", None), "num_layers", 12)
    # the scale-0 baseline reuses checkpoint_files[0]: cache the last load so
    # a multi-GB weights.tar isn't read + torch-converted twice back-to-back
    last_load: tuple[str, tuple] | None = None
    for cp, scale_override in runs:
        if last_load is not None and last_load[0] == cp:
            params, meta = last_load[1]
        else:
            params, meta = load_eval_params(cp, num_layers)
            last_load = (cp, (params, meta))
        scale = (
            scale_override
            if scale_override is not None
            else (film_scales or {}).get(cp, meta.get("film_scale", 1.0))
        )
        fcs, fcs_n, tars, tars_n, tims = [], [], [], [], []
        for batch in batches:
            x0 = batch.era5[0]
            sst_seq = (
                jnp.asarray(batch.sst[1 : steps + 1])
                if batch.sst is not None
                else None
            )
            outs_n = np.asarray(
                scan_rollout(
                    module,
                    params,
                    x0,
                    steps,
                    sst_seq=sst_seq,
                    normalizer=normalizer,
                    sst_normalizer=sst_normalizer,
                    scale=scale,
                    mesh=mesh,
                )
            )
            tar_raw = batch.era5[1 : steps + 1]
            tar_n = np.stack([np.asarray(normalizer(t)) for t in tar_raw])
            fc_raw = np.stack(
                [np.asarray(normalizer(o, reverse=True)) for o in outs_n]
            )
            fcs.append(fc_raw)
            fcs_n.append(outs_n)
            tars.append(tar_raw)
            tars_n.append(tar_n)
            tims.append(
                np.asarray(batch.times)[1 : steps + 1]
                if getattr(batch, "times", None) is not None
                else np.zeros(tar_raw.shape[:2], np.int64)
            )
        cat = lambda xs: np.concatenate(xs, axis=1)
        name = os.path.basename(cp) + ("" if scale_override is None else "@scale0")
        if name in reports:
            # same filename from different directories: keep both reports
            # (and their saved arrays) instead of silently overwriting
            parent = os.path.basename(os.path.dirname(cp)) or str(len(reports))
            name = f"{parent}/{name}".replace(os.sep, "_")
        reports[name] = evaluate_rollout(
            cat(fcs), cat(tars), climatology, cat(fcs_n), cat(tars_n),
            times=cat(tims),
        )
        log.info(
            "%s: mean skill %.4f, mean ACC %.4f",
            name,
            float(np.mean(reports[name].skill)),
            float(np.mean(reports[name].acc)),
        )
        if save_path:
            os.makedirs(save_path, exist_ok=True)
            reports[name].save(os.path.join(save_path, name))

    if save_path:
        plot_skill(reports, save_path)
    return reports


def plot_skill(reports: dict[str, SkillReport], save_path: str,
               variable_names: list[str] | None = None):
    """Per-variable skill/MSE PDF plots (reference model.py:1454-1482)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        log.warning("matplotlib unavailable; skipping plots")
        return
    for metric in ("skill", "mse_model", "acc"):
        if any(getattr(rep, metric, None) is None for rep in reports.values()):
            continue
        fig, ax = plt.subplots(figsize=(8, 4))
        for name, rep in reports.items():
            vals = getattr(rep, metric)
            ax.plot(np.mean(vals, axis=-1), marker="o", label=name)
        ax.set_xlabel("lead step")
        ax.set_ylabel(metric)
        ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(os.path.join(save_path, f"{metric}.pdf"))
        plt.close(fig)
