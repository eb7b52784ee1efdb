"""Datasets, synthetic scenes, and image IO."""
