"""Complex activations (reference: MSFNO/Models/sfno/activations.py:9-84).

The SFNO default is mode="real" (sfnonet.py:432): LeakyReLU applied to the
real part only, imaginary part passed through.  All modes are pure functions
of (z, bias) so they jit and shard trivially.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def complex_relu(
    z: jax.Array,
    mode: str = "real",
    negative_slope: float = 0.0,
    bias: jax.Array | None = None,
) -> jax.Array:
    act = lambda v: jax.nn.leaky_relu(v, negative_slope)
    if mode == "cartesian":
        return jax.lax.complex(act(jnp.real(z)), act(jnp.imag(z)))
    if mode == "modulus":
        b = 0.0 if bias is None else bias
        zabs = jnp.abs(z)
        scale = act(zabs + b) / jnp.maximum(zabs, 1e-30)
        return z * scale.astype(z.dtype)
    if mode == "halfplane":
        b = 0.0 if bias is None else bias
        angle = jnp.angle(z) - b
        cond = (0.0 <= angle) & (angle < jnp.pi / 2.0)
        return jnp.where(cond, z, negative_slope * z)
    if mode == "real":
        return jax.lax.complex(act(jnp.real(z)), jnp.imag(z))
    # identity
    return z


def complex_activation(
    z: jax.Array,
    act,
    mode: str = "cartesian",
    bias: jax.Array | None = None,
) -> jax.Array:
    """Generic complex wrapper for a real activation (reference
    ComplexActivation, activations.py:55-84): "cartesian" applies act to re
    and im independently; "modulus" rescales |z| through act; else identity."""
    if mode == "cartesian":
        return jax.lax.complex(act(jnp.real(z)), act(jnp.imag(z)))
    if mode == "modulus":
        b = 0.0 if bias is None else bias
        zabs = jnp.abs(z)
        scale = act(zabs + b) / jnp.maximum(zabs, 1e-30)
        return z * scale.astype(z.dtype)
    return z
