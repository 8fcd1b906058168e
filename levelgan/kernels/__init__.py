from levelgan.kernels.upsample_block import upsample_block_pallas  # noqa: F401
from levelgan.kernels.gp_penalty import gradient_penalty_pallas  # noqa: F401
