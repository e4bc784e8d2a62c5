"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The reference's distributed paths were only testable on real GPUs
(hardcoded NCCL rendezvous, /root/reference/src/multi_gpu_train.py:44).
Here every sharding/collective test runs on CPU with
``--xla_force_host_platform_device_count=8`` — the standard JAX way to
exercise pjit/shard_map collectives without TPU hardware.

Note: this image's sitecustomize registers a remote 'axon' TPU backend
and pins JAX_PLATFORMS=axon at interpreter start, so plain env-var
overrides are too late; we override through jax.config before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
