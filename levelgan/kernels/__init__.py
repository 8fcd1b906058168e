from levelgan.kernels.upsample_block import upsample_block_pallas  # noqa: F401
