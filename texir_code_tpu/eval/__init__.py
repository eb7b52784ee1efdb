"""Evaluation: optimized-material renderers, editing/relighting, testers."""
