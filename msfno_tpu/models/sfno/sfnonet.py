"""Full SFNO networks (reference MSFNO/Models/sfno/sfnonet.py:406-912).

FourierNeuralOperatorNet: encoder MLP -> +pos_embed -> num_layers spectral
blocks (resolution drops 6x inside block 0 and returns in the last block) ->
big-skip concat of the input -> decoder MLP.

FourierNeuralOperatorNetFilmed adds a FiLM generator over SST history whose
per-block (gamma, beta) modulate the trailing `film_layers` blocks
(sfnonet.py:699-860).  Backbone freezing is functional: the training step
takes gradients only w.r.t. the film parameter subset
(see msfno_tpu/training/partition.py), which is the JAX equivalent of the
reference's requires_grad=False + torch.no_grad() islands
(MSFNO/Models/sfno/model.py:1016-1026, sfnonet.py:817-844).

Layout: channels-last (B, H, W, C) on the grid, (B, L, M, C) in spectral
space.  Inputs/outputs use C=in_chans/out_chans (e.g. 73 ERA5 channels).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.models.sfno.blocks import FourierNeuralOperatorBlock
from msfno_tpu.parallel.annotate import annotate_grid
from msfno_tpu.models.sfno.layers import BigSkipMlp, Mlp, trunc_normal_init
from msfno_tpu.ops.fft import InverseRealFFT2, RealFFT2
from msfno_tpu.ops.sht import InverseRealSHT, RealSHT
from msfno_tpu.utils.config import SFNOConfig

Array = jax.Array


def build_transforms(cfg: SFNOConfig):
    """The four transforms (sfnonet.py:532-569): trans_down (full grid ->
    spectral), itrans_up (spectral -> full grid), trans/itrans (internal
    downsampled Gauss grid)."""
    nlat, nlon = cfg.img_size
    h, w = cfg.h, cfg.w
    lmax, mmax = cfg.modes_lat, cfg.modes_lon
    if cfg.spectral_transform == "sht":
        r = cfg.spectral_rescale
        md = cfg.sht_mxu_dtype
        trans_down = RealSHT(
            nlat, nlon, lmax=lmax, mmax=mmax, grid="equiangular",
            spectral_rescale=r, mxu_dtype=md,
        )
        itrans_up = InverseRealSHT(
            nlat, nlon, lmax=lmax, mmax=mmax, grid="equiangular",
            spectral_rescale=r, mxu_dtype=md,
        )
        trans = RealSHT(
            h, w, lmax=lmax, mmax=mmax, grid="legendre-gauss",
            spectral_rescale=r, mxu_dtype=md,
        )
        itrans = InverseRealSHT(
            h, w, lmax=lmax, mmax=mmax, grid="legendre-gauss",
            spectral_rescale=r, mxu_dtype=md,
        )
    elif cfg.spectral_transform == "fft":
        trans_down = RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
        itrans_up = InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
        trans = RealFFT2(h, w, lmax=lmax, mmax=mmax)
        itrans = InverseRealFFT2(h, w, lmax=lmax, mmax=mmax)
    else:
        raise ValueError(f"unknown spectral transform {cfg.spectral_transform!r}")
    return trans_down, itrans_up, trans, itrans


def _block_kwargs(cfg: SFNOConfig, i: int, transforms) -> dict:
    """Per-block wiring truth table (sfnonet.py:573-614)."""
    trans_down, itrans_up, trans, itrans = transforms
    first = i == 0
    last = i == cfg.num_layers - 1
    full = cfg.img_size
    down = (cfg.h, cfg.w)
    dpr = np.linspace(0, cfg.drop_path_rate, cfg.num_layers)
    return dict(
        forward_transform=trans_down if first else trans,
        inverse_transform=itrans_up if last else itrans,
        embed_dim=cfg.embed_dim,
        filter_type=cfg.filter_type,
        spectral_transform=cfg.spectral_transform,
        mlp_ratio=cfg.mlp_ratio,
        drop_rate=cfg.drop_rate,
        drop_path_rate=float(dpr[i]),
        norm_kind=cfg.normalization_layer,
        input_shape=full if first else down,
        output_shape=full if last else down,
        inner_skip="linear" if 0 < i < cfg.num_layers - 1 else None,
        outer_skip="identity" if 0 < i < cfg.num_layers - 1 else None,
        use_mlp=not last,
        complex_activation=cfg.complex_activation,
        spectral_layers=cfg.spectral_layers,
        compression=cfg.compression,
        rank=cfg.rank,
        use_pallas=cfg.use_pallas,
        mxu_dtype=cfg.spectral_mxu_dtype,
        pallas_grid_mlp=cfg.pallas_grid_mlp,
        grid_mlp_mxu_dtype=cfg.grid_mlp_mxu_dtype,
        checkpointing_mlp=cfg.checkpointing_mlp,
        fuse_norm=cfg.fuse_norm_sht,
        fuse_mlp_affine=cfg.fuse_inner_mlp,
        dtype=jnp.dtype(cfg.compute_dtype),
    )




def _mlp(remat: bool, name: str, **kw) -> Mlp:
    """Mlp, optionally rematerialized (reference --checkpointing-encoder/
    -decoder, main.py:813-831, sfnonet.py:818-858)."""
    cls = nn.remat(Mlp, static_argnums=(2,)) if remat else Mlp
    return cls(**kw, name=name)


def _encoder_fusible(cfg: SFNOConfig) -> bool:
    """True when the encoder MLP can emit longitude modes directly (fused
    forward DFT — grid_encoder_spectral): the standard non-linear-SHT /
    instance-norm / norm-fold configuration on the single-device Pallas
    path.  Block 0 then runs only the Legendre stage."""
    from msfno_tpu.parallel.annotate import active_mesh

    return (
        cfg.fuse_encoder_dft
        and cfg.pallas_grid_mlp
        and active_mesh() is None
        and cfg.filter_type == "non-linear"
        and cfg.spectral_transform == "sht"
        and cfg.normalization_layer == "instance_norm"
        and cfg.fuse_norm_sht
        and not cfg.checkpointing_encoder
    )


def _encode(net: nn.Module, cfg: SFNOConfig, x: Array,
            deterministic: bool, trans_down=None):
    """Encoder MLP + positional embed.  With the fused grid-MLP kernel the
    pe add rides the kernel's output write; otherwise it is a separate
    (XLA-fused) add after the Mlp.

    Returns (x, stats): when block-0's instance norm will be folded into
    the forward SHT (fuse_norm_sht), the encoder also produces the norm
    statistics — in-kernel on the pallas path — so the full-res activation
    is never re-read just to compute mean/var (round-5 trace: 2.3 ms/step).
    stats is None when the consumer computes its own.

    When the encoder->spectral fusion engages (`_encoder_fusible` +
    `trans_down` is the matmul-DFT RealSHT), the return is a
    `SpectralGridIn` marker wrapping the (B, H, 2M, C) longitude modes —
    the grid-space encoder output never touches HBM."""
    from msfno_tpu.models.sfno.layers import SpectralGridIn
    from msfno_tpu.ops.sht import RealSHT

    dtype = jnp.dtype(cfg.compute_dtype)
    want_stats = (
        cfg.fuse_norm_sht
        and cfg.normalization_layer == "instance_norm"
        and cfg.filter_type == "non-linear"
        and cfg.spectral_transform == "sht"
    )
    fuse_dft = (
        _encoder_fusible(cfg)
        and isinstance(trans_down, RealSHT)
        and trans_down.lon_dft == "matmul"
        and trans_down.mmax <= trans_down.nlon // 2 + 1
    )
    enc = _mlp(
        cfg.checkpointing_encoder,
        "encoder",
        hidden_features=cfg.embed_dim,
        out_features=cfg.embed_dim,
        output_bias=False,
        dtype=dtype,
        use_pallas=cfg.pallas_grid_mlp,
        mxu_dtype=cfg.grid_mlp_mxu_dtype,
        with_stats=want_stats,
    )
    pe = None
    if cfg.pos_embed:
        pe = net.param(
            "pos_embed",
            trunc_normal_init(0.02),
            (cfg.img_size[0], cfg.img_size[1], cfg.embed_dim),
        )
    if fuse_dft:
        f, stats = enc(
            x, deterministic, pe,
            spectral_cs=jnp.asarray(trans_down.merged_analysis),
        )
        return SpectralGridIn(f), stats
    out = enc(x, deterministic, pe)
    x, stats = out if want_stats else (out, None)
    return annotate_grid(x), stats


def _tail_fusible(cfg: SFNOConfig) -> bool:
    """True when the last block + decoder can run as the fused
    spectral->output kernel (ops/pallas/spectral_decoder.py): the standard
    non-linear-SHT / instance-norm / big-skip configuration, on the
    single-device Pallas path (same gate as the grid-MLP kernel)."""
    from msfno_tpu.parallel.annotate import active_mesh

    return (
        cfg.fuse_decoder_tail
        and cfg.pallas_grid_mlp
        and active_mesh() is None
        and cfg.big_skip
        and cfg.filter_type == "non-linear"
        and cfg.spectral_transform == "sht"
        and cfg.normalization_layer == "instance_norm"
        and cfg.fuse_norm_sht
        and cfg.drop_path_rate == 0.0
    )


def _decode(cfg: SFNOConfig, x, residual: Array,
            deterministic: bool, itrans=None) -> Array:
    """Decoder MLP, with the big-skip concat folded into a split-kernel
    first layer (and, under the fused kernel, no hidden-state HBM trip).
    When the last block ran in fused-tail mode, `x` is the (hm, a, b)
    spectral intermediate + affine and the whole tail runs as one kernel."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if isinstance(x, tuple):
        hm, a, b = x
        x = (hm, a, b, jnp.asarray(itrans.merged_matrix_t))
    if cfg.big_skip:
        dec_cls = (
            nn.remat(BigSkipMlp, static_argnums=(3,))
            if cfg.checkpointing_decoder
            else BigSkipMlp
        )
        return dec_cls(
            hidden_features=cfg.embed_dim,
            out_features=cfg.out_chans,
            in_main=cfg.embed_dim,
            skip_features=cfg.in_chans,
            dtype=dtype,
            use_pallas=cfg.pallas_grid_mlp,
            mxu_dtype=cfg.grid_mlp_mxu_dtype,
            # emit the model's output dtype directly: fp32 keeps the
            # final astype a no-op (kills the f32->bf16->f32 round trip,
            # round-5 trace: 1.6 ms/step); bf16 output_dtype additionally
            # halves the autoregressive carry copy + decoder write
            out_dtype=jnp.dtype(cfg.output_dtype),
            name="decoder",
        )(x, residual, deterministic)
    return _mlp(
        cfg.checkpointing_decoder,
        "decoder",
        hidden_features=cfg.embed_dim,
        out_features=cfg.out_chans,
        output_bias=False,
        dtype=dtype,
        use_pallas=cfg.pallas_grid_mlp,
        mxu_dtype=cfg.grid_mlp_mxu_dtype,
        out_dtype=jnp.dtype(cfg.output_dtype),
    )(x, deterministic)


class FourierNeuralOperatorNet(nn.Module):
    """SFNO (reference FourierNeuralOperatorNet, sfnonet.py:406-686)."""

    cfg: SFNOConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        transforms = build_transforms(cfg)
        residual = x

        x, enc_stats = _encode(self, cfg, x, deterministic,
                               trans_down=transforms[0])

        block_cls = FourierNeuralOperatorBlock
        if cfg.checkpointing_block:
            block_cls = nn.remat(FourierNeuralOperatorBlock, static_argnums=(5,))
        fuse_tail = _tail_fusible(cfg)
        for i in range(cfg.num_layers):
            blk = block_cls(
                **_block_kwargs(cfg, i, transforms),
                fuse_tail=fuse_tail and i == cfg.num_layers - 1,
                name=f"blocks_{i}",
            )
            x = blk(x, None, None, 1.0, deterministic,
                    enc_stats if i == 0 else None)

        x = _decode(cfg, x, residual, deterministic, itrans=transforms[1])
        return x.astype(jnp.dtype(cfg.output_dtype))


class FourierNeuralOperatorNetFilmed(nn.Module):
    """MSFNO: SFNO with FiLM conditioning on SST history
    (reference FourierNeuralOperatorNet_Filmed, sfnonet.py:699-860)."""

    cfg: SFNOConfig

    @nn.compact
    def __call__(
        self, x: Array, sst: Array, scale=1.0, deterministic: bool = True
    ) -> Array:
        from msfno_tpu.models.film.wrapper import FilmWrapper

        cfg = self.cfg
        film_cfg = cfg.film
        if film_cfg is None:
            raise ValueError("SFNOConfig.film must be set for the filmed net")
        transforms = build_transforms(cfg)

        # (B, 2, film_layers, C): gamma = [:, 0], beta = [:, 1]
        film_mod = FilmWrapper(film_cfg, name="film_gen")(
            sst, deterministic=deterministic
        )
        gamma, beta = film_mod[:, 0], film_mod[:, 1]

        residual = x
        x, enc_stats = _encode(self, cfg, x, deterministic,
                               trans_down=transforms[0])

        block_cls = FourierNeuralOperatorBlock
        if cfg.checkpointing_block:
            block_cls = nn.remat(FourierNeuralOperatorBlock, static_argnums=(5,))
        n_film = film_cfg.film_layers
        fuse_tail = _tail_fusible(cfg)
        for i in range(cfg.num_layers):
            filmed = film_cfg.repeat_film or i >= cfg.num_layers - n_film
            blk = block_cls(
                **_block_kwargs(cfg, i, transforms),
                filmed=filmed,
                fuse_tail=fuse_tail and i == cfg.num_layers - 1,
                name=f"blocks_{i}",
            )
            stats_i = enc_stats if i == 0 else None
            if filmed:
                film_idx = (
                    min(i, n_film - 1)
                    if film_cfg.repeat_film
                    else i - (cfg.num_layers - n_film)
                )
                x = blk(x, gamma[:, film_idx], beta[:, film_idx], scale,
                        deterministic, stats_i)
            else:
                x = blk(x, None, None, 1.0, deterministic, stats_i)

        x = _decode(cfg, x, residual, deterministic, itrans=transforms[1])
        return x.astype(jnp.dtype(cfg.output_dtype))
