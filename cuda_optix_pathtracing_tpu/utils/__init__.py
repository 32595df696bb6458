"""Host-side utilities: config, CLI, logging, timers, IO, checkpointing."""
