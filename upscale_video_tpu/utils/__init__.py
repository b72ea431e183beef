"""Shared utilities: logging setup, device batching."""
