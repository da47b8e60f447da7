"""Sources/sinks: synthetic data generators, table loaders, stage checkpoints."""
