"""Typed configuration for the framework.

The reference drives everything off a ~90-flag argparse tree whose kwargs dict
is passed around and wrapped as an attribute object (main.py:384-1137,
MSFNO/utils.py:34-37).  Here configs are frozen dataclasses: hashable (usable
as jit static args), serializable to/from JSON for checkpoint round-trips
(reference semantics: main.py:179-246), and grouped the same way the argparse
groups are (SURVEY.md section 5.6).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


def _asdict(cfg) -> dict[str, Any]:
    d = dataclasses.asdict(cfg)
    d["__config__"] = type(cfg).__name__
    return d


_REGISTRY: dict[str, type] = {}


def register(cls):
    _REGISTRY[cls.__name__] = cls
    return cls


def to_json(cfg) -> str:
    return json.dumps(_asdict(cfg), sort_keys=True)


def from_json(s: str):
    d = json.loads(s)
    name = d.pop("__config__")
    cls = _REGISTRY[name]
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in field_names:
            continue
        # rehydrate nested configs and tuples (dataclasses.asdict flattens
        # nested configs to plain dicts without the __config__ tag, so nested
        # rehydration is keyed by field name)
        if isinstance(v, dict) and "__config__" in v:
            v = from_json(json.dumps(v))
        elif isinstance(v, dict) and k == "film":
            v = from_json(json.dumps({**v, "__config__": "FilmConfig"}))
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


@register
@dataclasses.dataclass(frozen=True)
class FilmConfig:
    """FiLM generator configuration (reference "Architecture Film Gen" argparse
    group, main.py:1053-1137; Film_wrapper, sfnonet.py:863-912)."""

    film_gen_type: str = "gcn_custom"  # gcn | gcn_custom | transformer | mae | none
    film_layers: int = 1  # number of trailing filmed SFNO blocks
    repeat_film: bool = False  # film every block with shared (gamma, beta)
    model_depth: int = 6  # generator depth (gcn residual stack / vit blocks)
    embed_dim: int = 512  # generator hidden width
    mlp_dim: int = 512
    temporal_step: int = 28  # SST history length (days)
    coarse_level: int = 4  # SST coarsening factor: 721x1440 -> 180x360
    sst_shape: tuple[int, int] = (180, 360)
    patch_size: tuple[int, int, int] = (28, 9, 9)  # (t, h, w) for vit/mae
    nan_mask_threshold: float = 0.5
    dropout: float = 0.0
    num_film_features: int = 256  # = embed_dim_sfno of the backbone
    scale_weight: float = 1.0  # mae film-head init scaling
    compute_dtype: str = "float32"  # generator compute dtype (head stays fp32)
    # fused per-layer Pallas kernel for the gcn/gcn_custom generators
    # (ops/pallas/gcn_layer.py); single-device only, plain path under a mesh
    pallas_gcn: bool = True
    # mae generator: feed precomputed encoder cls tokens (B, embed_dim)
    # directly to the film head instead of running ContextCast each step
    # (reference cfg.cls path, sfnonet.py:900-907; mae/model.py:125-164)
    cls_input: bool = False


@register
@dataclasses.dataclass(frozen=True)
class SFNOConfig:
    """SFNO architecture config (reference FourierNeuralOperatorNet defaults,
    MSFNO/Models/sfno/sfnonet.py:406-441)."""

    img_size: tuple[int, int] = (721, 1440)
    scale_factor: int = 6
    in_chans: int = 73
    out_chans: int = 73
    embed_dim: int = 256
    num_layers: int = 12
    spectral_transform: str = "sht"  # sht | fft
    filter_type: str = "non-linear"  # non-linear | linear
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    normalization_layer: str = "instance_norm"  # instance_norm | layer_norm
    hard_thresholding_fraction: float = 1.0
    big_skip: bool = True
    compression: str | None = None  # None | "tt"
    rank: int = 128
    complex_activation: str = "real"
    spectral_layers: int = 3
    pos_embed: bool = True
    spectral_rescale: float = 1e5  # sfnonet.py:550-555 gradient-conditioning trick
    checkpointing_mlp: bool = False  # jax.checkpoint on block channel-MLPs
    # fold each block's instance-norm into its forward SHT (exact linear
    # rewrite; skips materializing the normalized field at full resolution)
    fuse_norm_sht: bool = True
    checkpointing_block: bool = False  # jax.checkpoint per block
    checkpointing_encoder: bool = False
    checkpointing_decoder: bool = False
    # compute dtype for grid-space MLPs; SHT + spectral MLP stay fp32
    # (mirrors reference AMP islands, layers.py:627-639)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    use_pallas: bool = False  # fused Pallas TPU kernels for the spectral MLP
    # fused grid-MLP Pallas kernel for the full-res encoder/decoder (the
    # hidden activation never round-trips HBM; pos-embed add fused into the
    # encoder's output write) — independent of use_pallas for A/B benching
    pallas_grid_mlp: bool = False
    # MXU input dtype inside the grid-MLP kernel (fp32 accumulation)
    grid_mlp_mxu_dtype: str = "bfloat16"
    # fused spectral->output decoder tail (inverse DFT + norm1/FiLM affine +
    # big-skip decoder in ONE Pallas pass, norm statistics computed in
    # spectral space): engages with pallas_grid_mlp on the standard
    # non-linear-SHT/instance-norm/big-skip configuration, single-device
    fuse_decoder_tail: bool = True
    # fused encoder->spectral head (encoder MLP + pos-embed + norm stats +
    # forward DFT in one Pallas pass; block 0 runs Legendre only): same
    # gate family as fuse_decoder_tail
    fuse_encoder_dft: bool = True
    # fold each inner block's norm1 + FiLM into the channel-MLP kernel as a
    # per-sample channel affine, and the outer identity skip into its
    # output write (blocks.py fuse_mlp_affine).  Off until the on-chip A/B
    # lands (tools/bench_inner_fuse.py)
    fuse_inner_mlp: bool = False
    # dtype of the model OUTPUT field.  "bfloat16" halves the autoregressive
    # scan's carry copy + the decoder write + the next step's input read
    # (round-5 trace: the f32 carry copy alone is 1.6 ms/step); the encoder
    # rounds its input to bf16 at the MXU on the fast tier anyway, so the
    # only numerics change is output storage rounding.  Keep "float32" for
    # training (loss targets) and the exact/balanced tiers.
    output_dtype: str = "float32"
    # MXU input dtype inside the fused spectral kernel: "bfloat16" runs the
    # complex matmuls at native MXU rate (~4x fp32 on v5e) with fp32
    # accumulation; "float32" reproduces the reference's fp32 spectral path
    spectral_mxu_dtype: str = "float32"
    # MXU input dtype for the SHT's DFT/Legendre matmuls (fp32 accumulate);
    # "float32" matches the reference's fully-fp32 transforms
    sht_mxu_dtype: str = "float32"
    film: FilmConfig | None = None

    @property
    def h(self) -> int:
        return self.img_size[0] // self.scale_factor

    @property
    def w(self) -> int:
        return self.img_size[1] // self.scale_factor

    @property
    def modes_lat(self) -> int:
        return int(self.h * self.hard_thresholding_fraction)

    @property
    def modes_lon(self) -> int:
        return int((self.w // 2 + 1) * self.hard_thresholding_fraction)


def tiny_sfno(film: bool = False) -> SFNOConfig:
    """Small config for tests / the minimum end-to-end slice
    (SURVEY.md section 7.3: 2 blocks, embed 64, 128x256 Gaussian grid)."""
    return SFNOConfig(
        img_size=(128, 256),
        scale_factor=2,
        in_chans=8,
        out_chans=8,
        embed_dim=64,
        num_layers=2,
        spectral_layers=2,
        film=FilmConfig(model_depth=2, embed_dim=64, mlp_dim=64, sst_shape=(32, 64))
        if film
        else None,
    )


@register
@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training configuration (reference "Training" argparse group,
    main.py:640-944; Trainer, MSFNO/Models/train.py:35-1337)."""

    batch_size: int = 1
    learning_rate: float = 5e-4
    optimizer: str = "adam"  # adam | adamw | sgd
    weight_decay: float = 0.0
    scheduler: str = "none"  # none | cosine | step
    scheduler_horizon: int = 2000
    loss_fn: str = "L2Sphere_noSine"  # default per main.py:874
    multi_step_training: int = 0  # extra autoregressive steps in the loss
    training_step_skip: int = 0  # skip factor between supervised steps
    discount_factor: float = 1.0  # per-step loss discount
    accumulation_steps: int = 0  # gradient accumulation (loss scaled by 1/(acc+1))
    validation_interval: int = 100
    validation_step_skip: int = 0
    multi_step_validation: int = 0
    save_checkpoint_interval: int = 1
    training_epochs: int = 1
    film_scale_start: float = 0.0  # FiLM scale ramp: +0.002 per validation
    film_scale_step: float = 0.002  # (train.py:638-641)
    retrain_film: bool = False  # unfreeze decoder + last blocks too
    seed: int = 42
    time_limit_s: float | None = None  # graceful stop (train.py:821-828)
    # Fuse this many sequential optimizer steps into ONE lax.scan launch
    # (trainer.train_steps): amortizes per-step host dispatch (~3-5 ms over
    # the remote-TPU relay; measured 66.5 -> 62.5 ms/step full-size).  The
    # host loop keeps the exact cadence contract — scan chunks never straddle
    # a validation boundary, partial tails fall back to single dispatched
    # steps — so logs/validation/checkpoints are identical to scan_steps=1.
    # No reference analogue (its loop dispatches per batch, train.py:201-298).
    scan_steps: int = 1
    # Checkpoint format: "npz" (single file) or "orbax" (directory; sharded
    # parallel writes across hosts — the TPU-pod production path).  Resume
    # accepts either format regardless of this setting.
    checkpoint_backend: str = "npz"
    # Async orbax saves: snapshot device arrays and return immediately,
    # writing to disk in the background (a full-size fp32 save is ~10-20 s
    # of blocking I/O otherwise).  Only meaningful with
    # checkpoint_backend="orbax"; the trainer drains in-flight writes at
    # finalize (checkpoint.wait_for_async_saves).
    async_checkpoint: bool = False
    # reference --advanced-logging (main.py:1047-1051): extra observability.
    # Per-variable MSE and gamma/beta stats are always logged here (cheap
    # under jit, unlike the reference's eager all_reduces); this flag adds
    # the reference's memory telemetry (mem_log/system_monitor,
    # train.py:747-756) per validation pass.
    advanced_logging: bool = False
    # Store the frozen backbone in bfloat16 (fast/bf16 compute config only).
    # Every consumer already rounds operands to bf16 at the MXU, so this is
    # numerically near-neutral while halving frozen-parameter HBM traffic
    # per step (the 721x1440x256 pos_embed alone is 1.06 GB in fp32).
    # Checkpoints saved while this is on store the backbone at bf16
    # precision; trainable (film) params always stay fp32.
    bf16_frozen_params: bool = False
