"""Config-system unit tests (SURVEY.md §3 "Config system")."""

from nafae_tpu.config import load_config


def test_resolved_kernels_default_is_auto():
    cfg = load_config(preset_name="config4")
    assert cfg.train.resolved_kernels() == "auto"


def test_resolved_kernels_legacy_use_pallas_wins_over_default():
    """ADVICE r1: use_pallas=true with kernels left at "auto" must select
    the fused Pallas kernels, as config.py's legacy comment promises."""
    cfg = load_config(preset_name="config4",
                      overrides=["train.use_pallas=true"])
    assert cfg.train.resolved_kernels() == "pallas"


def test_resolved_kernels_explicit_value_beats_legacy_flag():
    cfg = load_config(preset_name="config4",
                      overrides=["train.use_pallas=true",
                                 "train.kernels=jnp"])
    assert cfg.train.resolved_kernels() == "jnp"


def test_resolved_kernels_empty_string_legacy_path():
    cfg = load_config(preset_name="config4", overrides=["train.kernels="])
    assert cfg.train.resolved_kernels() == "jnp"
    cfg = load_config(preset_name="config4",
                      overrides=["train.kernels=", "train.use_pallas=true"])
    assert cfg.train.resolved_kernels() == "pallas"
