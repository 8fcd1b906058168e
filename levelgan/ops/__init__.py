from levelgan.ops.gumbel import gumbel_softmax, tau_schedule  # noqa: F401
from levelgan.ops.presence import presence_penalty  # noqa: F401
