"""Training/eval core: losses, metrics, train step, inference pipeline."""
