from diffndm_tpu.models.egnn import EGNN  # noqa: F401
from diffndm_tpu.models.dynamics import EGNNDynamics  # noqa: F401
