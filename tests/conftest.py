"""Test harness config: force an 8-device virtual CPU mesh before JAX loads.

This mirrors how the driver validates multi-chip sharding
(xla_force_host_platform_device_count) so the full pjit path is exercised
without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

RESOURCE_BEATMAP = (
    "/root/reference/resources/"
    "Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
)


@pytest.fixture(scope="session")
def beatmap_path() -> str:
    return RESOURCE_BEATMAP
