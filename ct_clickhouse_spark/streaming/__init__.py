"""Structured Streaming layer: the reference's ingestion dataflow and
change-stream tail as real streaming queries."""
