"""Custom data sources (PySpark 4 Python Data Source API)."""

from .corpus_source import CorpusDataSource, register_sources

__all__ = ["CorpusDataSource", "register_sources"]
