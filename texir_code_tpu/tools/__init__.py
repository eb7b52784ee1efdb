"""Offline tools (the reference's tools/ directory, TPU-native)."""
