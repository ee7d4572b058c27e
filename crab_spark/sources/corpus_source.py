"""``crab_corpus`` — a PySpark Python Data Source for the synthetic
crawl-graph corpus (the reference e2e fixture topology,
examples/test_server/test-server.py:9-56, as a table).

This is the DataSource-V2-style integration point: instead of calling
``corpus.corpus_df(spark, n)`` you can

    spark.dataSource.register(CorpusDataSource)
    spark.read.format("crab_corpus").option("n_pages", 100).load()

and get the same rows through Catalyst's source planning — partition
count derives from ``n_pages`` (one InputPartition per page chunk, so
generation parallelizes across executors), and the source declares its
schema up front so downstream pruning/filtering plans normally. A real
deployment would implement a fetch-backed or warehouse-backed source
with the same three classes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from ..corpus import (
    CORPUS_SCHEMA,
    DATA_TYPE,
    PAGE_TYPE,
    data_spans,
    data_url,
    page_spans,
    page_url,
)

_CHUNK = 64  # pages per input partition


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int, n_pages: int):
        self.start, self.end, self.n_pages = start, end, n_pages


class CorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_pages = int(options.get("n_pages", 100))

    def partitions(self) -> list[InputPartition]:
        return [
            _PageRange(s, min(s + _CHUNK, self.n_pages + 1), self.n_pages)
            for s in range(1, self.n_pages + 1, _CHUNK)
        ]

    def read(self, part: _PageRange) -> Iterator[tuple]:
        for p in range(part.start, part.end):
            yield (
                page_url(p),
                PAGE_TYPE,
                [tuple(s.values()) for s in page_spans(p, part.n_pages)],
            )
            for d in range(10):
                n = p * 10 + d
                yield (data_url(n), DATA_TYPE, [tuple(s.values()) for s in data_spans(n)])


class CorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crab_corpus"

    def schema(self) -> StructType:
        return CORPUS_SCHEMA

    def reader(self, schema: StructType) -> CorpusReader:
        return CorpusReader(self.options)


def register_sources(spark) -> None:
    spark.dataSource.register(CorpusDataSource)
