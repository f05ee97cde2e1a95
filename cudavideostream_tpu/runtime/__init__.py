"""Host runtime: frame sources, TCP server/client, executors, metrics."""
