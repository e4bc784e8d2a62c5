"""Training: losses, metrics, state, data-parallel train loop."""
