"""Race-track model family (SURVEY.md R2/R7 reconstruction).

The reference's second experiment line: a recurrent segment-emitter
generates race tracks (per-segment curvature + width), RL agents drive them
(car kinematics, off-track collision), and the adversarial curriculum
rewards tracks that are drivable but discriminate agent skill.

TPU-native: the emitter is a GRU under ``flax.nn.scan``; the race sim is a
``lax.scan`` over Frenet-frame car dynamics, vmapped over (tracks x cars);
training is the same one-jit-program WGAN-GP / curriculum machinery as the
tile family, sharing GANState, checkpointing, the mesh layer, and the CLIs
(``ModelConfig.family = 'track'``).
"""

from levelgan.track.data import TrackDataset, synthetic_tracks  # noqa: F401
from levelgan.track.models import TrackGenerator, TrackCritic  # noqa: F401
