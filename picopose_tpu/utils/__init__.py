"""Utilities: checkpoint port, orbax persistence, config, logging, profiling."""
