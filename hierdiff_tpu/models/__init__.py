from hierdiff_tpu.models.dynamics import EGNNDynamics  # noqa: F401
from hierdiff_tpu.models.diffusion import CoarseDiffusion  # noqa: F401
