"""Plan-shaping layer: checkpointed/resumable execution (north_rule) and
skew-aware partitioning helpers."""
