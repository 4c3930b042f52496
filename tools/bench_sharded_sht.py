"""Measure the sharded SHT (all_to_all transpose) vs the single-device SHT.

Runs on whatever devices exist: an 8-virtual-device CPU mesh in this image
(set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
or real chips on a pod.  CPU numbers only bound the *relative* all_to_all
overhead — wall-clock is not representative of ICI — but they make the
transpose cost visible instead of merely verified (round-1 VERDICT #6).

Prints one JSON line per configuration:
  {"nlat":..., "p":..., "plain_ms":..., "sharded_ms":..., "ratio":...}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _time(fn, *args, iters: int = 10) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from msfno_tpu.ops.sht import InverseRealSHT, RealSHT
    from msfno_tpu.parallel.sharded_sht import make_sharded_transforms

    n_dev = len(jax.devices())
    results = []
    # internal grid (120x240) and full-res-like uneven (721 analog at 181)
    for nlat, nlon, lmax, grid in [
        (120, 240, 120, "legendre-gauss"),
        (181, 360, 90, "equiangular"),
    ]:
        mmax = lmax + 1
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        x = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((1, nlat, nlon, 64))
            .astype(np.float32)
        )
        plain = jax.jit(lambda v: isht(sht(v)))
        plain_ms = _time(plain, x)
        for p in (2, 4, 8):
            if p > n_dev:
                continue
            mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p), ("lat",))
            s_f, s_i = make_sharded_transforms(sht, isht, mesh)
            roundtrip = jax.jit(lambda v: s_i(s_f(v)))
            h_pad = -(-nlat // p) * p
            xp = x
            xd = jax.device_put(
                xp, NamedSharding(mesh, P(None, "lat", None, None))
            ) if nlat % p == 0 else xp
            sharded_ms = _time(roundtrip, xd)
            rec = {
                "nlat": nlat, "nlon": nlon, "p": p,
                "plain_ms": round(plain_ms, 3),
                "sharded_ms": round(sharded_ms, 3),
                "ratio": round(sharded_ms / plain_ms, 3),
                "platform": jax.devices()[0].platform,
            }
            results.append(rec)
            print(json.dumps(rec))
    return results


if __name__ == "__main__":
    main()
