from levelgan.env.sim import EnvParams, rollout, start_positions, transition  # noqa: F401
from levelgan.env.agent import AgentPolicy, a2c_loss, init_agent  # noqa: F401
