"""Complex contraction kernels for spectral layers.

TPU-native re-design of the reference einsum kernels
(MSFNO/Models/sfno/contractions.py:11-169).  Differences from the reference:

- channels-last layout: spectral activations are (..., L, M, C) complex64,
  so channel mixing is a plain matmul over the last (lane) axis -> MXU.
- complex weights are stored as fp32 real pairs with a trailing dim of 2
  (same storage layout as the reference checkpoints) and combined with
  jax.lax.complex at use time.
- complex products are written as paired real einsums so XLA emits real
  matmuls with fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_complex(w: jax.Array) -> jax.Array:
    """(..., 2) real-pair storage -> complex64.

    bf16 storage (TrainConfig.bf16_frozen_params / serving_params) is
    upcast here: lax.complex only takes f32/f64, and the upcast fuses
    into the consumer — the HBM read already happened at half width.
    """
    if w.dtype != jnp.float32:
        w = w.astype(jnp.float32)
    return jax.lax.complex(w[..., 0], w[..., 1])


def _csplit(z):
    return jnp.real(z), jnp.imag(z)


def _cjoin(re, im):
    return jax.lax.complex(re, im)


def _ceinsum(spec: str, a: jax.Array, b: jax.Array, precision=None) -> jax.Array:
    """Complex einsum as 4 real einsums (fp32 accumulate on MXU)."""
    ar, ai = _csplit(a)
    br, bi = _csplit(b)
    f = lambda x, y: jnp.einsum(
        spec, x, y, precision=precision, preferred_element_type=jnp.float32
    )
    return _cjoin(f(ar, br) - f(ai, bi), f(ar, bi) + f(ai, br))


def compl_mul(x: jax.Array, w: jax.Array, precision=None) -> jax.Array:
    """Mode-shared channel mixing (reference compl_mul2d_fwd_c, "bixy,io->boxy").

    x: (..., L, M, C_in) complex; w: (C_in, C_out) complex.
    precision: XLA matmul precision (None = DEFAULT = 1-pass bf16 on TPU;
    see ops/sht.py:_matmul_precision for the measured tiers).
    """
    return _ceinsum("...i,io->...o", x, w, precision=precision)


def compl_muladd(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """compl_mul plus complex bias (reference compl_muladd2d_fwd_c)."""
    return compl_mul(x, w) + b


def compl_contract_dense(x: jax.Array, w: jax.Array) -> jax.Array:
    """Per-mode dense channel mixing (reference compl_contract2d_fwd_c,
    "bixy,kixy->bkxy").

    x: (..., L, M, C_in); w: (L, M, C_in, C_out) complex.
    """
    return _ceinsum("...lmi,lmio->...lmo", x, w)


def compl_contract_tril(x: jax.Array, w: jax.Array) -> jax.Array:
    """Per-mode mixing over a gathered triangular index set (reference
    compl_contract_fwd_c, "bin,kin->bkn").

    x: (..., K, C_in); w: (K, C_in, C_out) complex, K = #(l >= m) modes.
    """
    return _ceinsum("...ki,kio->...ko", x, w)


def contract_tt(x: jax.Array, g1: jax.Array, g2: jax.Array, g3: jax.Array) -> jax.Array:
    """Tensor-train compressed per-mode contraction (reference contract_tt,
    contractions.py:61-64 via compl_ttc1/2_c_fwd: out[b,o,t] =
    sum_{i,c,j} g1[o,i] g2[i,c,j] g3[j,t] x[b,c,t]).

    AXIS ROLES (reference einsum "oi,icj,jbct->bot"): g1's FIRST axis is the
    OUTPUT channel and g2's middle axis is the INPUT channel — the per-mode
    mixing matrix is M_k = g1 @ (sum_j g3[j,k] g2[:,:,j]), applied as
    M_k @ x_k.  (An earlier port used the transposed roles, i.e. M_k^T —
    silently wrong for converted reference TT checkpoints.)

    x: (..., K, C); g1: (C, R) [o,i], g2: (R, C, R) [i,c,j], g3: (R, K)
    [j,k], complex.  Returns (..., K, C).

    Contraction order: x is absorbed into g2 FIRST, giving a (..., K, R, R)
    peak intermediate — R^2/(R*C) = half the reference op order's
    (R, B, C, K) blow-up (and the minimum possible: g2 binds all three
    summation indices, so some K x R x R join is unavoidable)."""
    z = _ceinsum("icj,...kc->...kij", g2, x)
    u = _ceinsum("...kij,jk->...ki", z, g3)
    return _ceinsum("...ki,oi->...ko", u, g1)
