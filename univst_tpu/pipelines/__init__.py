"""Pipelines: wire models + schedulers + methods into the 4-step workflow."""
