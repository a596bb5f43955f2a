"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or an object-store URI for very large blobs) next to
typed metadata; run decode/feature-extraction as Arrow-batched
``mapInPandas`` so each Python worker touches a columnar batch, never a
row at a time; partition by size-balanced ranges so batches stay within
executor memory.

The container has no image/audio libraries, so REAL decoding is stubbed
behind ``decode_image`` (raises NotImplementedError unless PIL is
importable); the Spark-side plumbing — schema, batching, UDF signature,
deterministic fake features — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata schema accompanying every blob
BLOB_SCHEMA = "doc_id long, blob binary, mime string, n_bytes long"

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, sha1_8 string, fake_width int, fake_height int"
)


def attach_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal frame from text payloads (stand-in for image
    bytes): binary column + mime + size metadata."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
    )


def decode_image(blob: bytes):  # pragma: no cover - container has no PIL
    """Real image decode — stub.  Spark-side plumbing treats the blob
    as opaque; swap this for PIL/torchvision in a full container."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(blob))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL, not present in this container; "
            "the mapInPandas plumbing below is the real, tested part"
        ) from e


def _fake_decode_features(blob: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for decode: digest + pretend dimensions
    derived from the digest (stable across runs/partitionings)."""
    h = hashlib.sha1(blob).hexdigest()
    return h[:8], 16 + int(h[:4], 16) % 1024, 16 + int(h[4:8], 16) % 1024


def featurize_blobs(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams columnar batches through Python; output rows
    align 1:1 with input here, but the signature allows expansion
    (e.g. frame sampling from video → many rows per blob)."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["blob"].map(_fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(len).astype("int64"),
                    "sha1_8": feats.map(lambda t: t[0]),
                    "fake_width": feats.map(lambda t: t[1]).astype("int32"),
                    "fake_height": feats.map(lambda t: t[2]).astype("int32"),
                }
            )

    return blobs.mapInPandas(_featurize, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, offset long, frame_len long"

FRAME_CHUNK = 256
MAX_FRAMES = 4


def sample_frames(
    blobs: DataFrame, chunk: int = FRAME_CHUNK, max_frames: int = MAX_FRAMES
) -> DataFrame:
    """Frame sampling from a binary payload (the video path's shape):
    each blob yields up to ``max_frames`` evenly-spaced byte windows —
    1→N row expansion through ``mapInPandas``, the same contract real
    video frame extraction has (ffmpeg absent from this container, so
    the "frame" is a byte slice; offsets/lengths are integer arithmetic
    and the emitted ``frame_len`` is measured from the ACTUAL slice, so
    the oracle cross-checks that real bytes were windowed).

    Eviction-friendly at scale: expansion happens inside the Arrow
    batch, so a 4× row blow-up never materializes driver-side."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "offset": [], "frame_len": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n = len(blob)
                nf = min(max_frames, -(-n // chunk)) if n else 0
                for i in range(nf):
                    off = i * (n // nf)
                    frame = bytes(blob)[off : off + chunk]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["offset"].append(off)
                    out["frame_len"].append(len(frame))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_frames, schema=FRAME_SCHEMA)
