"""Streaming playback subpackage: see playback.py (engine + sinks) and
stream_queries.py (driver-contract smoke query)."""
