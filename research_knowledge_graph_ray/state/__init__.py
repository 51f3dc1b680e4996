"""Checkpoint manifests and resume support."""
