"""ocr_ray — a Ray-Data-native document-text-extraction engine.

Brand-new rebuild (not a port) of the extraction semantics of stjiris/OCR
(reference at /root/reference) as a streaming batch pipeline over
Common-Crawl-style Parquet page tables
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

Layout:

- ``kernels/``   pure, Ray-free correctness kernels (the test oracle)
- ``engines/``   OCR engine adapters (warm state held by actor pools)
- ``sources/``   payload sniffing + page explode (PDF/ZIP/TIFF/image)
- ``stages/``    Ray Data stage builders (map_batches / flat_map / groupby)
- ``sinks/``     partitioned resumable Parquet writer + export formats
- ``pipelines/`` end-to-end pipeline composition + per-stage metrics
- ``ops/``       large-scale training-data operators (dedup, ANN, quality)
"""

__version__ = "0.1.0"
