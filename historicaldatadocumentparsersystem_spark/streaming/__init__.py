"""Structured Streaming wrappers for the extraction pipeline."""

from .stream import (extraction_stream, run_discovery_stream_once,  # noqa: F401,E501
                     run_stream_once)
