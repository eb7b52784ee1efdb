"""Stage runners: experiment management, checkpointing, training loops."""
