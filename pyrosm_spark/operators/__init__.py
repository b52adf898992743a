"""DataFrame-level operators: the engine's query surface."""
