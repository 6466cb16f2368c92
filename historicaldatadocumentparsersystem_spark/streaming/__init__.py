"""Structured Streaming wrappers for the extraction pipeline."""

from .stream import extraction_stream, run_stream_once  # noqa: F401
