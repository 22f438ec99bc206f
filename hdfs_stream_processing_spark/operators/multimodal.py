"""Multimodal column plumbing (north star): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas stages.

The Spark-side architecture is the deliverable here: binary columns travel
as ``BinaryType`` next to typed metadata; decode / feature-extract stages
are ``mapInPandas`` generators (Arrow batch in, Arrow batch out — never
row-at-a-time Python), partitioning-agnostic, and schema-declared.  The
actual image/audio codecs are not in this container, so ``decode_image``
is a clearly-marked stub behind an import-try; the deterministic
``payload_meta`` path exercises the identical plumbing end-to-end and is
oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of payload_meta (declared, not inferred — mapInPandas
#: requires it and at scale you want the contract pinned anyway).
PAYLOAD_META_SCHEMA = "doc_id bigint, n_bytes bigint, payload_md5 string"

IMAGE_FEATURES_SCHEMA = "doc_id bigint, width int, height int, n_channels int"


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: (id, payload binary).  In production
    the binary column comes straight from parquet/avro; here it is the
    utf-8 encoding of the text column so every byte is deterministic."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def payload_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Extract metadata from a binary column via mapInPandas.

    This is the real multimodal hot path shape: Arrow slabs of binary
    cross into pandas once per batch, vectorized work happens there, a
    declared-schema Arrow slab comes back.  No collect, no per-row
    Python calls, safe under any partitioning.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(extract, schema=PAYLOAD_META_SCHEMA)


def decode_image(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Image decode stage — STUB: PIL/opencv are not in this container.

    The mapInPandas plumbing (batch iteration, declared schema, binary
    in / struct out) is identical to payload_meta; only the per-batch
    body differs.  With a codec present, replace the raise with
    ``Image.open(io.BytesIO(b))`` and emit real dimensions.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "image decode requires a codec library (PIL/opencv) not present "
                "in this environment; payload_meta exercises the same plumbing"
            ) from exc
        for pdf in batches:  # pragma: no cover
            raise NotImplementedError("real decode goes here")

    return df.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, feature array<float>, n_bytes bigint"


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", dims: int = 8
) -> DataFrame:
    """Feature-extraction stage over binary payloads (mapInPandas).

    The deterministic stand-in for an image/audio embedding model: a
    md5-derived float vector per payload.  Everything a real model stage
    needs is here and exercised — Arrow binary batches in, fixed-width
    ``array<float>`` out, declared schema, no driver involvement — only
    the per-batch body swaps for a real encoder.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]

            def feat(b: bytes) -> list[float]:
                d = hashlib.md5(bytes(b)).digest()
                return [round(d[i] / 255.0, 6) for i in range(dims)]

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "feature": payloads.map(feat),
                    "n_bytes": payloads.map(len).astype("int64"),
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 64,
    stride: int = 64,
) -> DataFrame:
    """Frame sampling over binary payloads (the video-pipeline stage):
    slice each payload into fixed-size byte windows at ``stride`` and
    emit one row per frame with its digest.

    This stage is fully REAL (byte slicing needs no codec): Arrow binary
    batches in, per-frame rows out, ~payload/stride amplification
    declared to the optimizer by the schema.  A real video stage swaps
    byte windows for container-aware frame extraction; the batching,
    schema, and fan-out shape are identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = max(0, (len(b) - frame_size) // stride + 1)
                for k in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(k)
                    digests.append(hashlib.md5(b[k * stride : k * stride + frame_size]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def resize_image(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
                 max_side: int = 256) -> DataFrame:
    """Image resize stage — STUB (no codec in this container), same
    mapInPandas shape as decode_image; with PIL present the body becomes
    thumbnail((max_side, max_side)) + re-encode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "image resize requires PIL/opencv, not present here; "
                "sample_frames exercises the same fan-out plumbing"
            ) from exc
        for pdf in batches:  # pragma: no cover
            raise NotImplementedError("real resize goes here")

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
