"""Evaluation subsystem: the jitted inference pipeline, BOP CSV, runners."""
