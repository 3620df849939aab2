from diffndm_tpu.guidance.oracle import RewardOracle  # noqa: F401
