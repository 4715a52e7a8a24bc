"""Utilities: FLOPs/BOPs accounting, profiling, logging helpers."""
