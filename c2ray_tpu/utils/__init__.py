"""IO, output streams, checkpointing, clocks, logging."""
