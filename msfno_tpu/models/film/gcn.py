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

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def neighbor_sum(v: Array) -> Array:
    """Sum of the 8 grid neighbors, periodic in longitude (axis -2),
    zero-padded at the poles (axis -3).  v: (B, H, W, F).

    reduce_window is the fastest lowering measured on v5e at the film
    generator's (180, 360, 512) working set (1.12 ms/apply bf16 vs 1.83 for
    a separable roll/shift formulation — the rolls materialize copies)."""
    v = jnp.concatenate([v[:, :, -1:], v, v[:, :, :1]], axis=2)
    window = jax.lax.reduce_window(
        v,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (1, 1), (0, 0), (0, 0)],
    )
    return window - v[:, :, 1:-1]


def gcn_normalize(mask: Array) -> Array:
    """d^{-1/2} per node for A+I over ocean nodes; 0 on land.  mask: (B,H,W,1)."""
    deg = neighbor_sum(mask) + 1.0
    return jnp.where(mask > 0, jax.lax.rsqrt(deg), 0.0)


class GraphConvolution(nn.Module):
    """One dense masked-grid GCN step (reference gcn/layers.py:8-48)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array, dinv_sqrt: Array) -> Array:
        support = nn.Dense(
            self.features,
            use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="weight",
        )(x)
        t = support * dinv_sqrt
        agg = (neighbor_sum(t) + t) * dinv_sqrt
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

        act = lambda v: jax.nn.leaky_relu(v, 0.01)
        x = act(
            GraphConvolution(self.embed_dim, dtype=self.dtype, name="conv1")(
                x, mask_c, dinv_c
            )
        )
        for i in range(self.depth):
            x = x + act(
                GraphConvolution(self.embed_dim, dtype=self.dtype, name=f"conv_{i}")(
                    x, mask_c, dinv_c
                )
            )
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
