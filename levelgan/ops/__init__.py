from levelgan.ops.gumbel import gumbel_softmax, tau_schedule  # noqa: F401
