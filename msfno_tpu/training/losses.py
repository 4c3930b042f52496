"""Loss functions (reference MSFNO/Models/losses.py, channels-last layout).

All losses take predictions/targets shaped (B, H, W, C) and are pure
functions; the configured default is l2_sphere_nosine (reference
--loss-fn L2Sphere_noSine, main.py:874).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.ops.quadrature import legendre_gauss

Array = jax.Array


@functools.lru_cache(maxsize=8)
def _gauss_w(h: int) -> np.ndarray:
    # legendre_gauss_weights(H, -1, 1)[1] analogue (losses.py:90,129);
    # the reference evaluates this on the *output grid's* H regardless of grid
    # type, matching torch_harmonics' quadrature helper.
    _, w = legendre_gauss(h)
    return np.asarray(w, dtype=np.float32)


@functools.lru_cache(maxsize=8)
def _cos_jacobian(h: int) -> np.ndarray:
    return np.abs(np.cos(np.linspace(-np.pi / 2, np.pi / 2, h))).astype(np.float32)


def cosine_mse(prd: Array, tar: Array, reduction: str = "mean", eps: float = 1e-4):
    """Cos-lat weighted MSE (reference CosineMSELoss, losses.py:6-28)."""
    h, w = prd.shape[-3], prd.shape[-2]
    wts = np.clip(np.cos(np.linspace(-np.pi / 2, np.pi / 2, h)), 0.0, None) + eps
    wts = (wts / wts.sum()).astype(np.float32)
    wts = jnp.asarray(wts)[:, None, None]
    loss = (prd - tar) ** 2 * wts
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss) / w
    return loss


def _l2_sphere_impl(
    prd: Array,
    tar: Array,
    sphere_weights: Array,
    relative: bool,
    squared: bool,
    reduction: str,
):
    if reduction == "none":
        loss = sphere_weights * (prd - tar) ** 2
        if relative:
            loss = loss / jnp.sum(sphere_weights * tar**2, axis=(-3, -2), keepdims=True)
        return loss
    loss = jnp.sum(sphere_weights * (prd - tar) ** 2, axis=(-3, -2))
    if relative:
        loss = loss / jnp.sum(sphere_weights * tar**2, axis=(-3, -2))
    if not squared:
        loss = jnp.sqrt(loss)
    return jnp.sum(loss)  # "sum" and "mean" both sum (losses.py:113-117)


def l2_sphere(
    prd: Array,
    tar: Array,
    relative: bool = True,
    squared: bool = False,
    reduction: str = "sum",
):
    """Quadrature x cos-jacobian weighted relative L2 (reference L2Sphere,
    losses.py:80-117)."""
    h = prd.shape[-3]
    w = jnp.asarray(np.abs(_gauss_w(h) * _cos_jacobian(h)))[:, None, None]
    return _l2_sphere_impl(prd, tar, w, relative, squared, reduction)


def l2_sphere_nosine(
    prd: Array,
    tar: Array,
    relative: bool = True,
    squared: bool = False,
    reduction: str = "sum",
):
    """Quadrature-only weighted relative L2 — the training default
    (reference L2Sphere_noSine, losses.py:119-155; default main.py:874)."""
    h = prd.shape[-3]
    w = jnp.asarray(_gauss_w(h))[:, None, None]
    return _l2_sphere_impl(prd, tar, w, relative, squared, reduction)


def _spectral_norm2(coeffs: Array, spectral_weights=None) -> Array:
    """|a|^2 summed over modes with the m>0 doubling, then over l AND channels
    (reference losses.py:160-163: norm2 (B,C,L) -> sum dims (-1,-2) -> (B,)).
    coeffs: (..., L, M, C) complex -> (...,) with L, M, C all reduced."""
    p = jnp.real(coeffs) ** 2 + jnp.imag(coeffs) ** 2
    if spectral_weights is not None:
        p = p * spectral_weights
    norm2 = p[..., 0, :] + 2.0 * jnp.sum(p[..., 1:, :], axis=-2)
    return jnp.sum(norm2, axis=(-2, -1))


def spectral_l2loss_sphere(
    sht, prd: Array, tar: Array, relative: bool = False, squared: bool = True
):
    """(reference spectral_l2loss_sphere, losses.py:158-176): per-sample norm
    summed over channels+modes, relative division per sample, batch mean."""
    loss = _spectral_norm2(sht(prd - tar))
    if relative:
        loss = loss / _spectral_norm2(sht(tar))
    if not squared:
        loss = jnp.sqrt(loss)
    return jnp.mean(loss)


def _l_weights(lmax: int) -> Array:
    ls = np.arange(lmax, dtype=np.float32)
    return jnp.asarray((ls * (ls + 1.0))[:, None, None])


def spectral_loss_sphere(
    sht, prd: Array, tar: Array, relative: bool = False, squared: bool = True
):
    """l(l+1)-weighted spectral loss (reference losses.py:178-203)."""
    sw = _l_weights(sht.lmax)
    loss = _spectral_norm2(sht(prd - tar), sw)
    if relative:
        loss = loss / _spectral_norm2(sht(tar), sw)
    if not squared:
        loss = jnp.sqrt(loss)
    return jnp.mean(loss)


def h1loss_sphere(sht, prd: Array, tar: Array, squared: bool = True):
    """H1-style loss (reference losses.py:205-232)."""
    coeffs = sht(prd - tar)
    h1 = _spectral_norm2(coeffs, _l_weights(sht.lmax))
    l2 = _spectral_norm2(coeffs)
    loss = (h1 + l2) if squared else (jnp.sqrt(h1) + jnp.sqrt(l2))
    return jnp.mean(loss)


def fluct_l2loss_sphere(sht_weights: Array, prd: Array, tar: Array, inp: Array,
                        relative: bool = False):
    """Fluctuation-weighted L2 (reference losses.py:234-244).
    sht_weights: (H,) quadrature weights for grid integration.

    Upstream quirk, replicated for parity: with relative=True the
    per-channel weight cancels algebraically ((w*a)/(w*b) == a/b,
    reference losses.py:239-241), so relative mode degenerates to a plain
    relative L2 — the fluctuation weighting only matters with
    relative=False."""
    w = sht_weights[:, None, None]
    integ = lambda f: jnp.sum(w * f, axis=(-3, -2))
    fluct = integ((tar - inp) ** 2)
    weight = fluct / jnp.sum(fluct, axis=-1, keepdims=True)
    loss = weight * integ((prd - tar) ** 2)
    if relative:
        loss = loss / (weight * integ(tar**2))
    return jnp.mean(loss)


def _sigma_transform(sigma: Array, kind: str) -> Array:
    if kind == "softplus":
        return jax.nn.softplus(sigma)
    if kind == "exp":
        return jnp.exp(sigma)
    if kind == "none":
        return sigma
    raise NotImplementedError(f"sigma transform {kind!r}")


def normal_crps(
    mu: Array,
    sigma: Array,
    observation: Array,
    mask: Array | None = None,
    reduction: str = "mean",
    sigma_transform: str = "softplus",
):
    """CRPS of a normal predictive distribution, Gneiting et al. 2005
    (reference NormalCRPS, losses.py:248-311).  mask: 1 where scored."""
    std = _sigma_transform(sigma, sigma_transform)
    z = (observation - mu) / std
    phi = jnp.exp(-(z**2) / 2.0) / math.sqrt(2.0 * math.pi)
    score = std * (
        z * jax.lax.erf(z / math.sqrt(2.0)) + 2.0 * phi - 1.0 / math.sqrt(math.pi)
    )
    if reduction == "none":
        return score
    if mask is not None:
        m = mask.astype(score.dtype)
        total = jnp.sum(score * m)
        if reduction == "mean":
            return total / jnp.maximum(jnp.sum(m), 1.0)
        return total
    return jnp.mean(score) if reduction == "mean" else jnp.sum(score)


def beta_nll(
    mu: Array,
    sigma: Array,
    observation: Array,
    beta: float = 0.5,
    reduction: str = "mean",
    sigma_transform: str = "softplus",
):
    """Beta negative log likelihood (reference Beta_NLL, losses.py:313-355)."""
    var = _sigma_transform(sigma, sigma_transform)
    loss = 0.5 * (((observation - mu) ** 2) / var + jnp.log(var))
    if beta > 0:
        loss = loss * jax.lax.stop_gradient(var) ** beta
    return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)


def statistical_loss(
    prediction: Array, observation: Array, ensemble_axis: int = -1,
    reduction: str = "mean", corrected: bool = False,
):
    """AtmoRep first-order statistical loss (reference StatisticalLoss,
    losses.py:357-400).

    The reference computes phi = exp(+z^2/2) (losses.py:389) — the SIGN of
    the Gaussian exponent is flipped vs the standard-normal pdf its own
    CRPS uses (losses.py:293), so phi explodes (fp32 inf at |z| ~ 13) for
    any poorly-calibrated sample and there is no eps on the sigma divide.
    Default replicates that bit-for-bit (the oracle parity suite pins it);
    corrected=True computes the intended exp(-z^2/2) with an eps-guarded
    sigma."""
    mu = jnp.mean(prediction, axis=ensemble_axis)
    sigma = jnp.std(prediction, axis=ensemble_axis)
    if corrected:
        z2 = ((mu - observation) / (sigma + 1e-8)) ** 2
        phi = jnp.exp(-z2 / 2.0)
    else:
        phi = jnp.exp(((mu - observation) / sigma) ** 2 / 2.0)
    stat_dist = (1.0 - phi) ** 2
    member_dist = jnp.sum(
        (prediction - jnp.expand_dims(observation, ensemble_axis)) ** 2,
        axis=ensemble_axis,
    )
    var_reg = jnp.sqrt(sigma)
    score = stat_dist + member_dist + var_reg
    return jnp.mean(score) if reduction == "mean" else jnp.sum(score)


@functools.lru_cache(maxsize=4)
def _loss_sht(h: int, w: int, lmax: int | None, mmax: int | None):
    """Equiangular-grid SHT for the spectral losses, cached per output shape
    (reference builds its solver once per trainer over the model grid)."""
    from msfno_tpu.ops.sht import RealSHT

    return RealSHT(
        h, w, lmax=lmax, mmax=mmax, grid="equiangular", spectral_rescale=1.0
    )


def _spectral_loss_entry(fn, lmax: int | None = None, mmax: int | None = None,
                         **kw):
    """Adapt an sht-solver loss to the (prd, tar) trainer signature with a
    lazily built grid-matched SHT.

    lmax/mmax SHOULD be the model's truncation (reference: the solver handed
    to these losses is the net's own trans_down, truncated to modes_lat/lon —
    sfnonet.py:532-545): untruncated at 721x1440 the Legendre weights alone
    are a (721, 721, 721) fp32 tensor (~1.5 GB on device) and every step
    pays a ~6x-larger matmul.  `get_loss(name, model_cfg)` threads them."""

    def loss(prd: Array, tar: Array):
        sht = _loss_sht(prd.shape[-3], prd.shape[-2], lmax, mmax)
        return fn(sht, prd, tar, **kw)

    return loss


# All reference losses reachable from --loss-fn (reference create_loss,
# train.py:433-446, exposes a subset; the spectral family losses.py:158-244
# is exposed here too).  NormalCRPS/Beta_NLL/StatisticalLoss take
# distributional predictions and are used by the MAE training path directly
# (registry_mae.py), not through this (prd, tar) registry;
# fluct_l2loss_sphere needs the input state as a third argument, so it is
# library-API only (the reference's create_loss does not expose it either).
LOSSES = {
    "CosineMSE": cosine_mse,
    # the reference's create_loss builds these with relative=True,
    # squared=True (train.py:436-440) — squared, NOT the constructors'
    # squared=False default; registry entries mirror the training semantics
    "L2Sphere": functools.partial(l2_sphere, relative=True, squared=True),
    "L2Sphere_noSine": functools.partial(
        l2_sphere_nosine, relative=True, squared=True
    ),
    "MSE": lambda p, t: jnp.mean((p - t) ** 2),
    "L1": lambda p, t: jnp.mean(jnp.abs(p - t)),
    "SpectralL2Sphere": _spectral_loss_entry(spectral_l2loss_sphere),
    "SpectralSphere": _spectral_loss_entry(spectral_loss_sphere),
    "H1Sphere": _spectral_loss_entry(h1loss_sphere),
}


# spectral-family losses need an SHT; built truncated to the model's modes
# when a config is available (see _spectral_loss_entry)
_SPECTRAL_LOSSES = {
    "SpectralL2Sphere": spectral_l2loss_sphere,
    "SpectralSphere": spectral_loss_sphere,
    "H1Sphere": h1loss_sphere,
}


def get_loss(name: str, model_cfg=None):
    """Resolve a --loss-fn name.  `model_cfg` (SFNOConfig), when given,
    truncates the spectral losses' SHT to the model's own modes_lat/lon —
    the reference semantics (its solver.sht is the truncated trans_down)."""
    if model_cfg is not None and name in _SPECTRAL_LOSSES:
        return _spectral_loss_entry(
            _SPECTRAL_LOSSES[name],
            lmax=model_cfg.modes_lat,
            mmax=model_cfg.modes_lon,
        )
    try:
        return LOSSES[name]
    except KeyError:
        raise ValueError(f"unknown loss {name!r}; choose from {sorted(LOSSES)}")
