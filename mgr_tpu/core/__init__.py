"""Core framework services: configs, PRNG, checkpoints, metrics, tracing."""
