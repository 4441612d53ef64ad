"""Utilities: logging/meters, checkpoints, torch weight conversion, viz."""
