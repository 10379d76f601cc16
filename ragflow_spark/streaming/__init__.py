from .ingest import stream_extract  # noqa: F401
