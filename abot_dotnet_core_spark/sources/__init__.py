"""Sources/sinks: synthetic corpus generation + snapshot state store."""
