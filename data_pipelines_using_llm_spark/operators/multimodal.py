"""Multimodal (image/audio/video) columns as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

No reference counterpart (the reference corpus is scalar-only, SURVEY.md
§1.2); this is the beyond-reference multimodal surface of a training-data
pipeline (BASELINE.json north star).  The container ships no image/audio
codecs, so the REAL decode step is stubbed behind ``require_codec`` (raises
``NotImplementedError`` unless PIL/soundfile appear), and the default path
is a DETERMINISTIC FAKE decode — the Spark-side plumbing (binary schema,
metadata struct, UDF signatures, Arrow batch iteration, per-kind
partitioning) is real and identical to what a real codec build would use,
and the fake features are pure functions of the payload so every operator
still has an exact DuckDB oracle.

Scale shape: ``mapInPandas`` streams Arrow batches through each partition —
no collect, no per-row Python round-trips; payload bytes never cross to
the driver.  At 100 TB the media table is partitioned by ``kind`` so each
codec's executors only scan their modality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.text import HASH_MOD

FRAME_CHARS = 256  # fake "frame" = 256 decoded characters
FRAME_STRIDE = 4  # sample every 4th frame
RESIZE_CHARS = 1024  # fake "resize" keeps the first 1024 characters

#: media schema: payload is opaque bytes; meta is the typed sidecar a real
#: pipeline carries (dimensions / sample rate / frame count).
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)
DECODE_STATS_SCHEMA = "media_id long, kind string, n_bytes long, checksum long"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_no int, frame_checksum long"
RESIZE_SCHEMA = (
    "media_id long, width int, height int, new_width int, new_height int, "
    "new_n_chars int, resized_checksum long"
)


def require_codec(kind: str) -> None:
    """Gate for the REAL decode path.  Raises unless the codec library is
    importable (it is not in this container — the deterministic fake
    below is the tested path; swap this gate for PIL/torchaudio/pyav when
    they exist)."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"real {kind} decode needs its codec library (not in container); "
            "use the deterministic fake decode path"
        ) from exc


def _poly_hash(s: str) -> int:
    """Polynomial codepoint hash — mirrors operators/text.py::char_hash
    (Spark ``ascii``/DuckDB ``ascii``/Python ``ord`` all yield the
    codepoint, so the three agree)."""
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def media_table(documents: DataFrame) -> DataFrame:
    """Derive the media table from ``documents``: payload = utf-8 bytes of
    the text (a stand-in for real image/audio/video bytes), kind assigned
    round-robin, metadata deterministic from doc stats."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
        F.lit(16_000).alias("sample_rate"),
        (F.col("n_chars") % 100 + 1).cast("int").alias("n_frames"),
    )


def decode_stats(media: DataFrame) -> DataFrame:
    """Fake decode + feature extraction over Arrow batches: byte length and
    codepoint checksum of every payload (a real build computes pixel/PCM
    stats in exactly this position)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [bytes(p).decode("utf-8") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "checksum": [_poly_hash(t) for t in texts],
                }
            )

    return media.repartition("kind").mapInPandas(fn, DECODE_STATS_SCHEMA)


def frame_sample(media: DataFrame) -> DataFrame:
    """Frame sampling for the ``video`` modality: split the decoded stream
    into FRAME_CHARS-sized frames, keep every FRAME_STRIDE-th, emit one
    row per sampled frame (a real build slices actual frames here)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            frame_nos: list[int] = []
            checks: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                n_full = len(text) // FRAME_CHARS
                for frame_no in range(0, n_full, FRAME_STRIDE):
                    frame = text[
                        frame_no * FRAME_CHARS : (frame_no + 1) * FRAME_CHARS
                    ]
                    ids.append(int(mid))
                    frame_nos.append(frame_no)
                    checks.append(_poly_hash(frame))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame_checksum": checks}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        fn, FRAME_SAMPLE_SCHEMA
    )


def resize_image(media: DataFrame) -> DataFrame:
    """Fake resize for the ``image`` modality: keep the first RESIZE_CHARS
    decoded characters (a real build rescales pixels here; the metadata
    update and batch shape are what's under test)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [bytes(p).decode("utf-8") for p in pdf["payload"]]
            clipped = [t[:RESIZE_CHARS] for t in texts]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": [32] * len(pdf),
                    "new_height": [32] * len(pdf),
                    "new_n_chars": [len(t) for t in clipped],
                    "resized_checksum": [_poly_hash(t) for t in clipped],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(fn, RESIZE_SCHEMA)


# ---- perceptual-hash near-dup detection (image dedup pipeline shape) ----

PHASH_BITS = 20  # matches the cross-engine hash-arithmetic range
PHASH_FRAME_CHARS = 8  # fake "tile": 8 decoded chars per signature bit
PHASH_MAX_HAMMING = 4
PHASH_SCHEMA = "media_id long, kind string, phash long"


def phash(media: DataFrame) -> DataFrame:
    """Fake perceptual hash over the decoded payload — one signature bit
    per ``PHASH_FRAME_CHARS``-char tile (parity of the tile's polynomial
    checksum), so payloads sharing a prefix share low bits: the locality
    property a real pHash (DCT low-frequency signs) provides for pixels,
    reproduced deterministically for the text-backed fake.  Runs as the
    same Arrow ``mapInPandas`` shape a real pHash kernel would (payload
    bytes stay on the executors; output is one long per media row)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for payload in pdf["payload"]:
                text = bytes(payload).decode("utf-8")
                h = 0
                for j in range(PHASH_BITS):
                    tile = text[
                        j * PHASH_FRAME_CHARS : (j + 1) * PHASH_FRAME_CHARS
                    ]
                    if tile:
                        h |= (_poly_hash(tile) & 1) << j
                sigs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": sigs,
                }
            )

    return media.mapInPandas(fn, PHASH_SCHEMA)


def phash_pairs(
    media: DataFrame,
    bits: int = PHASH_BITS,
    max_hamming: int = PHASH_MAX_HAMMING,
) -> DataFrame:
    """Within-modality perceptual near-dup pairs:
    ``hamming(phash_a, phash_b) <= max_hamming`` for media of the SAME
    kind — the image-dedup pipeline stage, expressed with the lossless
    pigeonhole bit-band blocking of operators/dedup.py::simhash_pairs
    (a within-radius pair must agree exactly on one of
    ``max_hamming + 1`` disjoint segments; first agreeing segment owns
    the pair, so no dedup shuffle)."""
    from data_pipelines_using_llm_spark.operators.dedup import simhash_segment

    n_seg = max_hamming + 1

    def seg(sh, s: int):
        return simhash_segment(sh, s, bits, n_seg)

    sig = phash(media)
    banded = sig.select(
        "media_id",
        "kind",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg_id"),
                        seg(F.col("phash"), s).alias("seg_val"),
                    )
                    for s in range(n_seg)
                ]
            )
        ).alias("sg"),
    ).select("media_id", "kind", "phash", "sg.seg_id", "sg.seg_val")
    a, b = banded.alias("a"), banded.alias("b")
    first_match = F.least(
        *[
            F.when(
                seg(F.col("a.phash"), s) == seg(F.col("b.phash"), s), F.lit(s)
            ).otherwise(F.lit(n_seg))
            for s in range(n_seg)
        ]
    )
    return (
        a.join(
            b,
            (F.col("a.kind") == F.col("b.kind"))
            & (F.col("a.seg_id") == F.col("b.seg_id"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .filter(F.col("a.seg_id") == first_match)
        .select(
            F.col("a.kind").alias("kind"),
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
