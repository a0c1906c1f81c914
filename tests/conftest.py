"""Test env: CPU jax with 8 virtual devices (SURVEY.md §5 item 3).

Note: this container's axon TPU plugin registers itself at interpreter boot via
sitecustomize and ignores the JAX_PLATFORMS env var; `jax.config.update` after
import is what actually selects the CPU backend. XLA_FLAGS must still be set
before the CPU client initializes (lazily, at first device use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    """Small synthetic dataset shared across tests."""
    from nafae_tpu.data.synthetic import generate_synthetic_dataset
    root = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_dataset(root, "train", num_segments=32, feat_dim=64,
                               num_regions=6, min_frames=3, max_frames=8,
                               max_words=3, seed=0, class_pool=8)
    generate_synthetic_dataset(root, "val", num_segments=12, feat_dim=64,
                               num_regions=6, min_frames=3, max_frames=8,
                               max_words=3, seed=1, class_pool=8)
    return root
