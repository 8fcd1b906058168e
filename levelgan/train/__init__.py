from levelgan.train.state import GANState, create_state, make_optimizers  # noqa: F401
from levelgan.train.gan import make_gan_step  # noqa: F401
from levelgan.train.wgan_gp import make_wgan_gp_step  # noqa: F401
