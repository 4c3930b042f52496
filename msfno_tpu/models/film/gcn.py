"""Graph-convolution FiLM generators over the ocean-only SST grid.

Reference: MSFNO/Models/gcn/{gcn.py,layers.py}.  The reference gathers ocean
pixels (NaN-masked) into a ragged node list and multiplies by a precomputed
sparse adjacency loaded from asset files (edge_index_coarsen_4.pt /
adj_coarsen_4_sparse.pt, gcn/gcn.py:32-35,137-140).

TPU-native re-design: the ocean graph IS a grid graph, so we never build a
sparse matrix.  Nodes stay dense on the (H, W) coarse grid; one GCN step

    h = D^{-1/2} (A + I) D^{-1/2} (x W) + b

becomes a 3x3 neighbor-sum window (periodic in longitude, zero past the
poles) over mask-zeroed features, with degree normalization computed from the
mask.  Everything is static-shaped, mask-parameterized, and MXU/VPU friendly;
no gather/scatter, no ragged batches (the reference is hard-coded to batch
size 1, gcn/gcn.py:53 — this version is batched).

Connectivity: 8-neighbor + self loop (Kipf-Welling normalization).  The
reference's asset-file graph is not in the repo; this choice is documented
here and fixed by tests.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=8)
def _band_matrices(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(T_H, T_W) fp32 3-tap band matrices: T_H tridiagonal ones (zero past
    the poles), T_W circulant tridiagonal (periodic longitude).

    W >= 3 required: at W=2 a circulant 3-tap stencil double-counts the
    single wrap neighbor (j-1 and j+1 are the same column) and a 0/1 band
    matrix cannot express that, so the rewrite would silently diverge from
    the stencil semantics on such degenerate grids."""
    if w < 3:
        raise ValueError(f"box3 needs >= 3 longitude columns, got {w}")
    i = np.arange(h)
    th = (np.abs(i[:, None] - i[None, :]) <= 1).astype(np.float32)
    j = np.arange(w)
    d = np.abs(j[:, None] - j[None, :])
    tw = ((d <= 1) | (d == w - 1)).astype(np.float32)
    return th, tw


def box3(v: Array) -> Array:
    """3x3 box sum (self + 8 neighbors), periodic in longitude (axis -2),
    zero past the poles (axis -3).  v: (B, H, W, F).

    TPU-first lowering: the separable 3-tap sums are BAND MATMULS
    box3(v) = T_H @ v @ T_W, which run on the MXU; the reduce_window
    lowering measured 1.12 ms/apply bf16 at (180, 360, 512) (~12% of the
    HBM roofline) and its VJP costs the same again, while the band-matmul
    pair is ~36 GFLOP there (~0.3 ms) with a matmul transpose as VJP."""
    dt = v.dtype
    # fp32 (parity) inputs keep true-f32 band sums (DEFAULT would round the
    # data operand to bf16); bf16 fast-mode inputs use the one-pass MXU path
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # Accumulation happens in f32 inside the MXU either way; asking for an
    # f32 OUTPUT on the bf16 path materialized two f32[H,W,F] intermediates
    # per box3 that were immediately rounded back to bf16 (round-5 trace:
    # ~0.9 ms/step of convert+write traffic across the 7 GCN layers).
    # Emitting bf16 directly is the same rounding with none of the traffic.
    out_dt = jnp.float32 if dt == jnp.float32 else dt
    th, tw = _band_matrices(v.shape[-3], v.shape[-2])
    v = jnp.einsum("gh,...hwf->...gwf", jnp.asarray(th), v,
                   precision=prec, preferred_element_type=out_dt)
    return jnp.einsum("wv,...hwf->...hvf", jnp.asarray(tw), v,
                      precision=prec, preferred_element_type=out_dt
                      ).astype(dt)


def neighbor_sum(v: Array) -> Array:
    """Sum of the 8 grid neighbors (box3 minus the center), periodic in
    longitude (axis -2), zero past the poles (axis -3).  v: (B, H, W, F)."""
    return box3(v) - v


def gcn_normalize(mask: Array) -> Array:
    """d^{-1/2} per node for A+I over ocean nodes; 0 on land.  mask: (B,H,W,1)."""
    deg = neighbor_sum(mask) + 1.0
    return jnp.where(mask > 0, jax.lax.rsqrt(deg), 0.0)


class _GCNDenseParams(nn.Module):
    """Parameter holder with nn.Dense's tree ({kernel}) and the reference's
    leaky-relu-gain xavier init, for the fused-kernel path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel",
            nn.initializers.variance_scaling(
                2.0 / (1.0 + 0.01**2), "fan_avg", "uniform"
            ),
            (in_features, self.features),
        )


class GraphConvolution(nn.Module):
    """One dense masked-grid GCN step (reference gcn/layers.py:8-48).

    `fuse=True` routes through the fused Pallas layer kernel
    (ops/pallas/gcn_layer.py) which ALSO applies the trailing leaky-relu and
    optional residual add — the generator passes them in and skips its own.
    The parameter tree is identical either way ({weight/kernel, bias})."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    fuse: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Array, dinv_sqrt: Array,
                 residual: Array | None = None) -> Array:
        if self.fuse:
            from msfno_tpu.ops.pallas.gcn_layer import gcn_layer

            k = _GCNDenseParams(self.features, name="weight")(x.shape[-1])
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            assert self.use_bias
            return gcn_layer(
                x, k, b, dinv_sqrt, mask, residual=residual,
                mxu_dtype=str(jnp.dtype(self.dtype)),
                out_dtype=self.dtype,
            )
        assert residual is None, "residual fusion requires fuse=True"
        support = nn.Dense(
            self.features,
            use_bias=False,
            # reference: xavier_uniform with the leaky_relu(0.01) gain
            # (gcn/layers.py:31) = sqrt(2/(1+0.01^2)) x variance ~2x;
            # variance_scaling(scale=gain^2, fan_avg, uniform) == that
            kernel_init=nn.initializers.variance_scaling(
                2.0 / (1.0 + 0.01**2), "fan_avg", "uniform"
            ),
            dtype=self.dtype,
            name="weight",
        )(x)
        t = support * dinv_sqrt
        # (A + I) aggregation = 3x3 box sum (neighbor_sum(t) + t == box3(t))
        agg = box3(t) * dinv_sqrt
        if self.use_bias:
            agg = agg + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return agg * mask


class GCNFilmGenerator(nn.Module):
    """Residual GCN stack -> ocean-mean pool -> film head.

    `custom=True` mirrors GCN_custom (gcn/gcn.py:96-168: single-feature input,
    film head weight init = ones); `custom=False` mirrors GCN (gcn/gcn.py:12-91:
    temporal window as node features, film head zero-init).
    """

    out_features: int
    embed_dim: int = 512
    depth: int = 6
    custom: bool = True
    dtype: jnp.dtype = jnp.float32
    # fused per-layer Pallas kernel (ops/pallas/gcn_layer.py): Dense + box3
    # stencil + normalize/bias/mask/activation/residual in one HBM pass
    # (round-5 trace: the unfused 7-layer stack cost ~5.3 ms/step);
    # single-device only — under an active mesh the plain path runs
    use_pallas: bool = False

    @nn.compact
    def __call__(self, sst: Array, deterministic: bool = True) -> Array:
        # sst: (B, T, H, W) with NaN over land
        if sst.ndim == 3:
            sst = sst[:, None]
        mask = jnp.logical_not(jnp.isnan(sst[:, -1]))[..., None].astype(jnp.float32)
        if self.custom:
            # single scalar feature per node: the most recent SST step
            x = jnp.nan_to_num(sst[:, -1])[..., None]
        else:
            # temporal window as node features (B, H, W, T)
            x = jnp.moveaxis(jnp.nan_to_num(sst), 1, -1)
        x = x * mask
        dinv = gcn_normalize(mask)
        x = x.astype(self.dtype)
        mask_c = mask.astype(self.dtype)
        dinv_c = dinv.astype(self.dtype)

        from msfno_tpu.parallel.annotate import active_mesh

        fuse = self.use_pallas and active_mesh() is None

        act = lambda v: jax.nn.leaky_relu(v, 0.01)

        def layer(v, res, name):
            gc = GraphConvolution(
                self.embed_dim, dtype=self.dtype, fuse=fuse, name=name
            )
            if fuse:
                # the kernel applies activation + residual internally
                return gc(v, mask_c, dinv_c, residual=res)
            y = act(gc(v, mask_c, dinv_c))
            return y if res is None else res + y

        x = layer(x, None, "conv1")
        for i in range(self.depth):
            x = layer(x, x, f"conv_{i}")
        x = x.astype(jnp.float32)

        # mean over ocean nodes (global_mean_pool / mean(dim=-2))
        n = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
        pooled = jnp.sum(x * mask, axis=(1, 2)) / n

        head_init = nn.initializers.ones if self.custom else nn.initializers.zeros
        return nn.Dense(
            self.out_features,
            kernel_init=head_init,
            bias_init=nn.initializers.zeros,
            name="head_film",
        )(pooled)
