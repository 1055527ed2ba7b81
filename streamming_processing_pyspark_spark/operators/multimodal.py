"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Pattern for 100 TB multimodal tables: media lives as an opaque ``binary``
column with a typed metadata struct beside it; decode / feature-extraction
runs as Arrow-batched ``mapInPandas`` so each task processes whole record
batches without per-row Python overhead, and the *schema* is declared up
front so Catalyst can prune/pushdown around the opaque column.

The container has no image/audio libraries, so the actual media decode is a
clearly-marked stub (:func:`decode_media_stub`); everything Spark-side —
binary column handling, metadata struct, mapInPandas batch shape,
deterministic feature extraction — is real and oracle-checked
(:func:`multimodal_features` reproduces byte-exact integer features that the
DuckDB oracle recomputes from the text the binary was derived from).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict[str, DataFrame]

CHECKSUM_MOD = 997
FRAME_BYTES = 256

FEATURE_SCHEMA = "doc_id bigint, byte_len int, checksum int, n_frames int"


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct.

    Locally the payload is the utf-8 encoding of ``text`` (deterministic,
    ASCII in the testdata); in production it would be image/audio bytes read
    from object storage.
    """
    return documents.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("media_type"),
            F.length(F.encode("text", "utf-8")).alias("byte_len"),
        ).alias("media_meta"),
    )


def _extract_features(batches: Iterator) -> Iterator:
    """Arrow-batched feature extraction over the binary payload.

    Pure-integer features so results are bit-exact and oracle-checkable:
    byte length, byte-sum checksum, frame count at FRAME_BYTES per frame.
    """
    import pandas as pd

    for pdf in batches:
        payloads = pdf["payload"]
        byte_len = payloads.map(len)
        checksum = payloads.map(lambda b: sum(b) % CHECKSUM_MOD)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int32"),
                "checksum": checksum.astype("int32"),
                "n_frames": (byte_len // FRAME_BYTES + 1).astype("int32"),
            }
        )


def multimodal_features(t: Tables) -> DataFrame:
    """Binary-payload feature extraction via mapInPandas (the real plumbing)."""
    payload = with_binary_payload(t["documents"])
    return payload.select("doc_id", "payload").mapInPandas(
        _extract_features, schema=FEATURE_SCHEMA
    )


def decode_media_stub(t: Tables) -> DataFrame:
    """Media decode stub — the production signature without the codec.

    Raises NotImplementedError at execution: image/audio codecs are not in
    this container. The plumbing (schema, batch iteration) is the same as
    :func:`multimodal_features`.
    """

    def _decode(batches: Iterator) -> Iterator:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "environment; see multimodal_features for the checked plumbing"
        )
        yield  # pragma: no cover

    payload = with_binary_payload(t["documents"])
    return payload.mapInPandas(
        _decode, schema="doc_id bigint, width int, height int"
    )


ORACLES: dict[str, str] = {
    "multimodal_features": f"""
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS byte_len,
               CAST(list_sum(list_transform(generate_series(1, length(text)),
                    i -> ascii(substring(text, i, 1)))) % {CHECKSUM_MOD}
                    AS INTEGER) AS checksum,
               CAST(length(text) // {FRAME_BYTES} + 1 AS INTEGER) AS n_frames
        FROM documents
    """,
}

QUERIES = {
    "multimodal_features": multimodal_features,
}
