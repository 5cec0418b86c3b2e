"""Training orchestration: jitted steps, experiments, metrics, checkpoints."""
