"""Shared plumbing: logging and HTTP helpers (reference src/utils/)."""
