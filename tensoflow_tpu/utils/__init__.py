"""Utilities: timing, logging, profiling."""
