"""Training layer: losses, metrics, trainer, config."""
