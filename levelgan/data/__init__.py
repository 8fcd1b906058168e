from levelgan.data.codec import encode, decode  # noqa: F401
from levelgan.data.augment import augment, d4_apply  # noqa: F401
from levelgan.data.dataset import LevelDataset, synthetic_corpus  # noqa: F401
