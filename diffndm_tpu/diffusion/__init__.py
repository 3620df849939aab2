from diffndm_tpu.diffusion.schedules import (  # noqa: F401
    GammaSchedule,
    cosine_alphas2,
    make_schedule,
    polynomial_alphas2,
)
