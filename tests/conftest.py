"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX trick of
forcing N host-platform devices lets the sharding/collective tests exercise
real mesh partitioning logic on CPU (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep TF (used only to generate golden fixtures) off any accelerator
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
