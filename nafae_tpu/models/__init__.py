from nafae_tpu.models.grounding import GroundingModel, init_params  # noqa: F401
