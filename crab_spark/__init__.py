"""crab_spark — a PySpark-native crawl/parse analytics engine.

A from-scratch rebuild of the capabilities of the reference scraper
``bazhenov/crab`` (a single-process Rust/tokio CLI over SQLite), expressed
Spark-first: the page store becomes partitioned columnar tables, the
URL-seen set becomes a hash-bucketed anti-join (with a Bloom pre-filter),
the crawl loop becomes a deterministic epoch driver whose per-epoch DAG is
pure DataFrame code, and the user parser API (navigate/parse/validate)
runs as vectorized Arrow/pandas UDFs instead of per-row GIL calls.

Layout
------
- ``session``    SparkSession factory tuned for the target cluster shape
- ``schemas``    StructTypes for frontier / documents(spans) / links / metrics
- ``urlnorm``    URL canonicalization (parity w/ the ``url`` crate) + UDFs
- ``store``      epoch-versioned parquet table store (Iceberg swap-in point)
- ``corpus``     deterministic synthetic crawl-graph corpus (test fixture)
- ``frontier``   register (dedup anti-join) / dequeue (depth,seq top-k)
- ``crawler``    the epoch loop driver (fetch → validate → store → navigate)
- ``parsers``    parser registry + span-based example parsers
- ``tabulator``  ragged dynamic-column table union → CSV export
- ``oracle``     pure-Python reimplementation of the reference loop
- ``operators``  training-data ops: dedup, similarity, text analysis, multimodal
"""

__version__ = "0.1.0"
