"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set the env vars before jax is imported anywhere in the test process.
Mirrors SURVEY.md section 4's test-pyramid plan (the reference itself has no
unit tests; see MSFNO/Models/train.py:1196-1337 for its harness-style checks).
"""

import os

# NOTE: in this image jax is pre-imported by a sitecustomize hook with the
# axon TPU platform registered, so env vars alone are not enough — we also
# update the (lazily-consumed) jax config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
