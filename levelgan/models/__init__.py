from levelgan.models.generator import Generator, generator_stages  # noqa: F401
from levelgan.models.critic import Critic  # noqa: F401
from levelgan.models.heads import sample_head  # noqa: F401
