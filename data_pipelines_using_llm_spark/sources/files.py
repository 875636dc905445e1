"""Generic file-format source adapters (extension — the reference ingests
only REST JSON, ``First experiment/Claude Opus 4.py:35-43``; a reusable
engine also lands CSV exports and JSON-lines event dumps).

Every adapter returns a plain DataFrame scan, so Catalyst keeps pushdown /
pruning where the format supports it.  Format notes that matter at scale:

- **parquet**: splittable, columnar, predicate+projection pushdown — the
  preferred interchange; ``load_table`` (tables.py) adds nanosecond
  timestamp handling on top of this adapter.
- **csv**: splittable only without multiline quoting; a declared schema
  avoids the full extra inference scan (``inferSchema`` reads the data
  TWICE); column binding is by position when ``header=False``.
- **jsonl**: one object per line is splittable; a declared schema again
  skips the inference pass, and corrupt rows land in
  ``_corrupt_record`` under PERMISSIVE mode instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with a declared schema (no inference double-scan unless the
    caller really asks for it by passing ``schema=None``)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is None:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    keep_corrupt: bool = True,
) -> DataFrame:
    """JSON-lines scan.  With a declared schema, malformed lines become a
    ``_corrupt_record`` string column (PERMISSIVE) so one bad line in a
    100 TB drop quarantines instead of killing the job; pass
    ``keep_corrupt=False`` for DROPMALFORMED."""
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if keep_corrupt:
            schema = T.StructType(
                list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
            )
        reader = reader.schema(schema)
    mode = "PERMISSIVE" if keep_corrupt else "DROPMALFORMED"
    return reader.option("mode", mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other splittable columnar interchange format.  Like
    parquet it carries its schema and supports predicate pushdown +
    column pruning (min/max stripe statistics), so plans over ORC inputs
    keep the same PushedFilters/ReadSchema properties the parquet gates
    assert."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Raw text ingestion: one row per line (splittable), or one row per
    FILE with ``whole_file=True`` (``wholetext`` — NOT splittable; use
    only for small-document corpora where line splitting would break
    document boundaries).  NOTE: ``wholetext`` must go through the
    ``text()`` kwarg — a generic ``.option("wholetext", ...)`` is
    silently ignored by the text source."""
    return spark.read.text(path, wholetext=whole_file)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-media ingestion via Spark's built-in ``binaryFile`` source:
    each matched file becomes one row of (path, modificationTime, length,
    content binary) — the landing scan for image/audio/video corpora
    that operators/multimodal.py then processes as opaque payloads.

    Scale notes: the source is NOT splittable (one file = one row read by
    one task), so media corpora should be stored as many moderate files —
    which is how image datasets ship anyway; ``glob`` prunes by pattern
    at listing time (partition-discovery level, before any read), and
    ``max_bytes`` guards against a stray multi-GB file OOM-ing an
    executor by filtering on the catalog ``length`` column, which Spark
    evaluates from file metadata without reading content."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df
