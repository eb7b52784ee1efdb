"""Renderers, lighting engines, neural fields, and losses."""
