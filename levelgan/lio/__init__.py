from levelgan.lio.metrics import (  # noqa: F401
    tile_histogram, kl_divergence, histogram_kl, MetricsLogger)
