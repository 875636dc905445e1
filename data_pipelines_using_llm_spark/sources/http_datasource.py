"""HTTP API as a REGISTRABLE Spark data source (Python DataSource API,
Spark 4): ``spark.read.format("http_api").option("urls", ...).load()``.

This upgrades the reference's driver-side ``requests.get`` ingestion
(``First experiment/Claude Opus 4.py:35-43``) into a first-class source:
each URL becomes an ``InputPartition``, so fetches run ON THE EXECUTORS,
one task per endpoint — the catalog-integrated twin of
``http_api.fetch_url_table`` (which fans out an existing URL DataFrame).

Scale: a million-endpoint crawl is a million input partitions scheduled
like any other scan — locality-free, retry-per-task, no driver loop, and
downstream operators see an ordinary DataFrame.  Options are strings (the
DataSource contract), so the transport is NOT injectable here; determinism
in tests comes from ``file://`` URLs, which the stdlib opener serves
without a network.

Options:
- ``urls``       whitespace/comma-separated URL list (required)
- ``timeout``    per-request seconds (default 60)
- ``on_error``   'null' (default: payload NULL, error recorded) | 'raise'
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from data_pipelines_using_llm_spark.sources.http_api import (
    DEFAULT_TIMEOUT_S,
    default_fetcher,
)

SCHEMA = "url string, payload string, error string"


def _split_urls(raw: str | None) -> list[str]:
    if not raw:
        raise ValueError("http_api source requires an 'urls' option")
    return [u for u in raw.replace(",", " ").split() if u]


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class _HttpApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.urls = _split_urls(options.get("urls"))
        self.timeout = float(options.get("timeout", DEFAULT_TIMEOUT_S))
        self.on_error = options.get("on_error", "null")
        if self.on_error not in ("null", "raise"):
            raise ValueError("on_error must be 'null' or 'raise'")

    def partitions(self) -> Sequence[InputPartition]:
        # one task per endpoint: executor-side fan-out, no driver loop
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        try:
            yield (partition.url, default_fetcher(partition.url, self.timeout), None)
        except Exception as exc:  # noqa: BLE001 — error becomes a column
            if self.on_error == "raise":
                raise
            yield (partition.url, None, f"{type(exc).__name__}: {exc}")


class HttpApiDataSource(DataSource):
    """``format("http_api")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "http_api"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _HttpApiReader:
        return _HttpApiReader(self.options)


def register_http_source(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(HttpApiDataSource)
