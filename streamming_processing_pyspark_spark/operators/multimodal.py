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


def multimodal_features(t: Tables) -> DataFrame:
    """Binary-payload feature extraction via mapInPandas (the real plumbing).

    Pure-integer features so results are bit-exact and oracle-checkable:
    byte length, byte-sum checksum, frame count at FRAME_BYTES per frame.

    The batch function is NESTED (like every other Arrow UDF in the
    package) so cloudpickle ships it by value: a module-level function is
    pickled by reference and requires the package to be importable on the
    Python workers, which breaks when the driver process wasn't launched
    from the repo root.
    """

    def _extract_features(batches: Iterator) -> Iterator:
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


FRAME_SAMPLE_EVERY = 4

FRAME_SCHEMA = "doc_id bigint, frame_id int, frame_len int, frame_checksum int"


def frame_sample(t: Tables) -> DataFrame:
    """Frame sampling over the binary payload: keep every k-th frame.

    The video-pipeline shape — payload is segmented into fixed
    ``FRAME_BYTES`` frames and only every ``FRAME_SAMPLE_EVERY``-th frame
    survives (the "sample 1 fps" step). Arrow-batched ``mapInPandas``
    expansion, map-only: each doc emits its kept frames independently, no
    shuffle. Locally the per-frame features are integer checksums so the
    oracle can recompute them from the source text.
    """

    def _frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, fids, flens, fsums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fid in range(0, (len(payload) - 1) // FRAME_BYTES + 1):
                    if fid % FRAME_SAMPLE_EVERY:
                        continue
                    frame = payload[fid * FRAME_BYTES : (fid + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    fids.append(fid)
                    flens.append(len(frame))
                    fsums.append(sum(frame) % CHECKSUM_MOD)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "frame_len": pd.Series(flens, dtype="int32"),
                    "frame_checksum": pd.Series(fsums, dtype="int32"),
                }
            )

    payload = with_binary_payload(t["documents"])
    return payload.select("doc_id", "payload").mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


ORACLES: dict[str, str] = {
    "frame_sample": f"""
        WITH f AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, (length(text) - 1) // {FRAME_BYTES}))
                   AS frame_id
          FROM documents
        )
        SELECT doc_id,
               CAST(frame_id AS INTEGER) AS frame_id,
               CAST(length(substring(text, frame_id * {FRAME_BYTES} + 1,
                    {FRAME_BYTES})) AS INTEGER) AS frame_len,
               CAST(list_sum(list_transform(
                    generate_series(1, length(substring(text,
                      frame_id * {FRAME_BYTES} + 1, {FRAME_BYTES}))),
                    i -> ascii(substring(substring(text,
                      frame_id * {FRAME_BYTES} + 1, {FRAME_BYTES}), i, 1))))
                    % {CHECKSUM_MOD} AS INTEGER) AS frame_checksum
        FROM f WHERE frame_id % {FRAME_SAMPLE_EVERY} = 0
    """,
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
    "frame_sample": frame_sample,
}
