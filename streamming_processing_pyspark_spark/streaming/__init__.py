"""Structured Streaming jobs: windowed counts, geofence, trending, word count."""
