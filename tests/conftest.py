"""Test env: CPU jax with 8 virtual devices (SURVEY.md §5 item 3).

Note: this container's axon TPU plugin registers itself at interpreter boot via
sitecustomize and ignores the JAX_PLATFORMS env var; `jax.config.update` after
import is what actually selects the CPU backend. XLA_FLAGS must still be set
before the CPU client initializes (lazily, at first device use).
"""

import os
import re

# force EXACTLY 8 virtual devices: a leftover smaller value in the shell
# (e.g. =4 from an ad-hoc run) would fail the 8-device mesh tests with
# confusing device-count errors instead of being corrected here
flags = os.environ.get("XLA_FLAGS", "")
m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if m is None:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
elif int(m.group(1)) < 8:
    flags = flags.replace(m.group(0),
                          "--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


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
