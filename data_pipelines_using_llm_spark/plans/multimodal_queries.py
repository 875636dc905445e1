"""Multimodal query pack: binary media columns + mapInPandas decode /
frame-sample / resize plumbing (operators/multimodal.py).

The decode is a deterministic fake (codec libs absent — see
``require_codec``), which is exactly what makes the Arrow-UDF path
oracle-checkable: every feature is a pure function of the payload, so
DuckDB can recompute it from the source text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators import multimodal as MM
from data_pipelines_using_llm_spark.plans.text_queries import SQL_CHAR_HASH
from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

_SQL_KIND = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.media_table(load_table(spark, sf_dir, "documents"))


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed catalog of the binary media table (payload projected to its
    byte length — the bytes themselves never leave the executors)."""
    return _media(spark, sf_dir).select(
        "media_id",
        "kind",
        "width",
        "height",
        "sample_rate",
        "n_frames",
        F.octet_length("payload").alias("n_bytes"),
    )


MEDIA_CATALOG_ORACLE = f"""
SELECT doc_id AS media_id,
       {_SQL_KIND} AS kind,
       CAST(n_chars % 64 + 1 AS INT) AS width,
       CAST(n_chars % 48 + 1 AS INT) AS height,
       16000 AS sample_rate,
       CAST(n_chars % 100 + 1 AS INT) AS n_frames,
       octet_length(encode(text)) AS n_bytes
FROM documents
"""


def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake decode: byte length + codepoint checksum."""
    return MM.decode_stats(_media(spark, sf_dir))


MEDIA_DECODE_STATS_ORACLE = f"""
SELECT doc_id AS media_id,
       {_SQL_KIND} AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       {SQL_CHAR_HASH.format(s='text')} AS checksum
FROM documents
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 256-char frame of each video payload, one row per frame."""
    return MM.frame_sample(_media(spark, sf_dir))


MEDIA_FRAME_SAMPLE_ORACLE = f"""
WITH v AS (
    SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id,
       CAST(t.frame_no AS INT) AS frame_no,
       {SQL_CHAR_HASH.format(
           s=f"substr(text, CAST(t.frame_no AS INT) * {MM.FRAME_CHARS} + 1, {MM.FRAME_CHARS})"
       )} AS frame_checksum
FROM v, UNNEST(range(0, CAST(floor(length(text) / {MM.FRAME_CHARS}) AS BIGINT),
               {MM.FRAME_STRIDE})) t(frame_no)
"""


def media_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake image resize: clip to the first 1024 chars, emit new metadata
    + checksum of the clipped content."""
    return MM.resize_image(_media(spark, sf_dir))


MEDIA_RESIZE_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST(n_chars % 64 + 1 AS INT) AS width,
       CAST(n_chars % 48 + 1 AS INT) AS height,
       32 AS new_width,
       32 AS new_height,
       CAST(least(length(text), {MM.RESIZE_CHARS}) AS INT) AS new_n_chars,
       {SQL_CHAR_HASH.format(s=f"substr(text, 1, {MM.RESIZE_CHARS})")} AS resized_checksum
FROM documents
WHERE doc_id % 3 = 0
"""


QUERIES = {
    "media_catalog": QuerySpec(media_catalog, MEDIA_CATALOG_ORACLE, "binary media catalog"),
    "media_decode_stats": QuerySpec(media_decode_stats, MEDIA_DECODE_STATS_ORACLE, "mapInPandas fake decode"),
    "media_frame_sample": QuerySpec(media_frame_sample, MEDIA_FRAME_SAMPLE_ORACLE, "video frame sampling"),
    "media_resize_meta": QuerySpec(media_resize_meta, MEDIA_RESIZE_ORACLE, "fake image resize"),
}


def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-modality perceptual near-dup pairs (hamming <= 4 over
    20-bit tile-parity signatures) — the image-dedup pipeline stage.
    Signature extraction is the Arrow ``mapInPandas`` path; pairing is
    the lossless pigeonhole bit-band join (operators/multimodal.py::
    phash_pairs).  The oracle recomputes the signature per doc from the
    source text and compares ALL same-kind pairs — blocking stays
    invisible, the gate verifies the pigeonhole theorem."""
    return MM.phash_pairs(_media(spark, sf_dir))


def _phash_sql(col: str) -> str:
    bits = []
    for j in range(MM.PHASH_BITS):
        tile = f"substr({col}, {j * MM.PHASH_FRAME_CHARS + 1}, {MM.PHASH_FRAME_CHARS})"
        h = SQL_CHAR_HASH.format(s=tile)
        bits.append(
            f"(CASE WHEN len({tile}) > 0 THEN (({h}) % 2) << {j} "
            f"ELSE 0 END)"
        )
    return " + ".join(bits)


MEDIA_PHASH_DEDUP_ORACLE = f"""
WITH sig AS (
    SELECT doc_id AS media_id, {_SQL_KIND} AS kind,
           {_phash_sql('text')} AS phash
    FROM documents
)
SELECT a.kind,
       a.media_id AS media_id_a,
       b.media_id AS media_id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM sig a JOIN sig b
  ON a.kind = b.kind AND a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= {MM.PHASH_MAX_HAMMING}
"""

QUERIES["media_phash_dedup"] = QuerySpec(
    media_phash_dedup,
    MEDIA_PHASH_DEDUP_ORACLE,
    "perceptual-hash near-dup pairs per modality (bit-band blocked)",
)
