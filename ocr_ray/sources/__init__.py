"""Payload sniffing, page explode, and parquet readers."""
