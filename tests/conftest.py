"""Test harness config: force an 8-device virtual CPU mesh.

The container's sitecustomize registers a remote TPU backend (platform
'axon') in every Python process and sets JAX_PLATFORMS=axon, so env vars
alone don't stick — we override at the jax.config level before any backend
initializes. This mirrors how the driver validates multi-chip sharding
(xla_force_host_platform_device_count equivalent) without TPU hardware.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

RESOURCE_BEATMAP = (
    "/root/reference/resources/"
    "Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
)


@pytest.fixture(scope="session")
def beatmap_path() -> str:
    return RESOURCE_BEATMAP
