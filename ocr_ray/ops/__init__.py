"""Data-processing operators beyond the extraction core: relational
demonstrations over the TPC-H-ish tables, training-data ops (dedup families,
similarity search, text analysis) over documents/embeddings, and the
multimodal plumbing. Each operator has a `queries()` entry in
``__ray_entry__`` and, where SQL-expressible, a DuckDB oracle."""
