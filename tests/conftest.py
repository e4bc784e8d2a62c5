"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The reference's distributed paths were only testable on real GPUs
(hardcoded NCCL rendezvous, /root/reference/src/multi_gpu_train.py:44).
Here every sharding/collective test runs on CPU with
``--xla_force_host_platform_device_count=8`` — the standard JAX way to
exercise pjit/shard_map without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
