"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or an object-store URI for very large blobs) next to
typed metadata; run decode/feature-extraction as Arrow-batched
``mapInPandas`` so each Python worker touches a columnar batch, never a
row at a time; partition by size-balanced ranges so batches stay within
executor memory.

The container has no image/audio codec libraries, so CODEC decoding
(JPEG/PNG/audio) is stubbed behind ``decode_image`` (raises
NotImplementedError unless PIL is importable).  Two real paths exist
regardless: the Spark-side plumbing — schema, batching, UDF signature,
deterministic fake features — and, since round 5, a REAL no-codec
decoder: :func:`decode_ppm` parses binary P6/PPM images (header
tokenization + numpy payload reshape) with closed-form features
driver-attested in ``q_multimodal_decode``.
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


# ------------------------------------------------------------------ real decode (PPM)

#: P6 features: dimensions from the parsed header, per-channel means
#: from the parsed pixel matrix
PPM_FEATURE_SCHEMA = (
    "doc_id long, width int, height int,"
    " mean_r double, mean_g double, mean_b double"
)


def encode_ppm_solid_gradient(doc_id: int) -> bytes:
    """Deterministic P6 (binary PPM) image for ``doc_id``: a gradient
    where pixel (x, y) has channel value base_c + x + y, with
    base_c = (doc_id·k_c) mod 200 — bounded so no value exceeds 255
    and every per-channel mean has the closed form
    base_c + (w−1)/2 + (h−1)/2, which the DuckDB oracle can state
    exactly (integers + halves are exact in float64 on both engines)."""
    import numpy as np

    w = 4 + doc_id % 13
    h = 3 + doc_id % 7
    bases = [(doc_id * k) % 200 for k in (7, 13, 29)]
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(b + x + y).astype(np.uint8) for b in bases], axis=-1
    )  # (h, w, 3)
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + img.tobytes()


def decode_ppm(blob: bytes):
    """REAL image decode, no external libraries: parse the P6 header
    (magic, arbitrary whitespace-separated width/height/maxval), then
    interpret the pixel payload via numpy frombuffer → (h, w, 3).
    This replaces the PIL-gated stub for the one raster format that
    needs no codec — the full decode pipeline (header tokenization,
    payload length validation, reshape, feature math) is exercised
    against driver-attested closed-form features in
    q_multimodal_decode."""
    import numpy as np

    if blob[:2] != b"P6":
        raise ValueError(f"not a P6 PPM: magic={blob[:2]!r}")
    # tokenize header: magic, width, height, maxval, then ONE
    # whitespace byte before the payload
    tokens, i, n = [], 2, len(blob)
    while len(tokens) < 3 and i < n:
        while i < n and blob[i : i + 1].isspace():
            i += 1
        j = i
        while j < n and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(blob[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    payload = blob[i:]
    if len(payload) != w * h * 3:
        raise ValueError(f"payload {len(payload)} != {w}x{h}x3")
    return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)


def ppm_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: each batch's blobs are parsed with
    :func:`decode_ppm` and reduced to (dims, per-channel means)."""
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_ppm(bytes(blob))
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                means = sums / (w * h)
                rows.append((doc_id, w, h, means[0], means[1], means[2]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return blobs.mapInPandas(_decode, schema=PPM_FEATURE_SCHEMA)


def make_ppm_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, blob): synthesize the deterministic P6 payloads in an
    Arrow-batched stage — the bytes genuinely cross the Arrow boundary
    as a binary column before the decode stage parses them back."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob": pdf[id_col].map(
                        lambda i: encode_ppm_solid_gradient(int(i))
                    ),
                }
            )

    return df.select(id_col).mapInPandas(_encode, schema="doc_id long, blob binary")


def encode_ppm_textured(doc_id: int, eff_id: int) -> bytes:
    """Deterministic P6 image with a TEXTURED (non-monotonic) fill:
    every channel of pixel (x, y) is (eff_id·11 + x·31 + y·57) mod 251.
    Unlike the gradient fill (whose difference hash is all-ones by
    construction), the modular texture gives every image a distinct
    difference-hash bit pattern — and driving the fill by ``eff_id``
    rather than ``doc_id`` lets the caller PLANT exact-duplicate
    images under different doc_ids (the multimodal dedup ground
    truth).  Dimensions still derive from eff_id (w = 4 + e mod 13,
    h = 3 + e mod 7), so planted duplicates match byte-for-byte."""
    import numpy as np

    w = 4 + eff_id % 13
    h = 3 + eff_id % 7
    y, x = np.mgrid[0:h, 0:w]
    chan = ((eff_id * 11 + x * 31 + y * 57) % 251).astype(np.uint8)
    img = np.stack([chan, chan, chan], axis=-1)
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + img.tobytes()


def make_textured_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, blob) textured P6 images with planted duplicates:
    every doc with doc_id % 7 == 6 carries the SAME image bytes as
    doc_id − 1 (eff_id = doc_id − 1), everyone else their own."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            effs = ids - (ids % 7 == 6).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "blob": [
                        encode_ppm_textured(int(i), int(e))
                        for i, e in zip(ids, effs)
                    ],
                }
            )

    return df.select(id_col).mapInPandas(_encode, schema="doc_id long, blob binary")


def ppm_dhash(blobs: DataFrame, n_bits: int = 60) -> DataFrame:
    """Arrow-batched REAL decode → 60-bit difference hash: parse each
    P6 with :func:`decode_ppm`, then bit k (k < n_bits, row-major over
    the (h, w−1) horizontal-neighbor grid) is 1 iff
    pixel(x+1, y) > pixel(x, y) on channel 0.  dHash is the classic
    perceptual fingerprint for near-duplicate image detection; here
    the decode is real and the hash integer, so the downstream
    group-by is hash-oracle-able from the generator's closed form."""
    import numpy as np

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_ppm(bytes(blob)).astype(np.int64)
                h, w, _ = img.shape
                bits = (img[:, 1:, 0] > img[:, :-1, 0]).ravel()[:n_bits]
                phash = int(
                    (bits.astype(np.int64) << np.arange(len(bits))).sum()
                )
                out.append((doc_id, phash))
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return blobs.mapInPandas(_hash, schema="doc_id long, phash long")


# ------------------------------------------------------------------ real decode (WAV)

WAV_RATE = 8000

WAV_FEATURE_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, peak int, mean_square double"
)


def encode_wav_pcm16(doc_id: int) -> bytes:
    """Deterministic RIFF/WAVE file for ``doc_id``: mono 16-bit PCM at
    8 kHz, n = 500 + doc_id%500 samples with
    s_i = ((doc_id·7 + i·3) mod 2001) − 1000 — a formula DuckDB can
    replay per sample with range(), so the oracle brute-forces the
    same waveform rather than trusting a closed form."""
    import struct

    import numpy as np

    n = 500 + doc_id % 500
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 7 + i * 3) % 2001 - 1000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes):
    """REAL audio decode, no libraries: walk the RIFF chunk list
    (arbitrary chunk order / unknown chunks skipped word-aligned, as
    the format requires), validate PCM/mono/16-bit from the fmt
    chunk, and view the data chunk as int16 little-endian samples."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError(f"not RIFF/WAVE: {blob[:4]!r}/{blob[8:12]!r}")
    pos, end = 12, 8 + struct.unpack("<I", blob[4:8])[0]
    fmt = data = None
    while pos + 8 <= min(end, len(blob)):
        cid = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(f"only mono PCM16 supported, got {fmt}")
    return rate, np.frombuffer(data, dtype="<i2")


def wav_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode → per-clip features.  The
    mean-square numerator is an exact int64 sum, so the final double
    division is bit-identical to the oracle's CAST(SUM(s*s) AS
    DOUBLE)/n."""
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                rate, s = decode_wav(bytes(blob))
                s64 = s.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        len(s),
                        rate,
                        int(np.abs(s64).max()) if len(s) else 0,
                        # len guard like peak's: a valid RIFF/WAVE blob
                        # with a zero-length data chunk must not kill
                        # the task with ZeroDivisionError (review r12)
                        float((s64 * s64).sum()) / len(s) if len(s) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "peak", "mean_square"],
            )

    return blobs.mapInPandas(_decode, schema=WAV_FEATURE_SCHEMA)


#: fixed analysis window (samples) for the framed audio features
WAV_WINDOW = 100

WAV_WINDOW_SCHEMA = "doc_id long, win long, n long, sum_sq long, zcr long"


def wav_window_features(blobs: DataFrame, window: int = WAV_WINDOW) -> DataFrame:
    """Framed audio features (the real DSP verb after decode): fixed
    ``window``-sample frames per clip, each reduced to energy (exact
    int64 Σs²) and zero-crossing count (s_i·s_{i-1} < 0, attributed to
    the later sample's frame).  One Arrow-batched 1→N stage — the same
    mapInPandas shape as :func:`sample_frames` — with all features as
    exact integers so the oracle can brute-force them per sample.

    Numpy note: the per-frame sums go through ``np.bincount`` float64
    weights; frames hold ≤100 samples of |s| ≤ 1000, so every partial
    sum is ≤ 1e8 ≪ 2^53 — exact in float64, cast back to int64
    losslessly."""
    import numpy as np

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("doc_id", "win", "n", "sum_sq", "zcr")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                _, s = decode_wav(bytes(blob))
                s64 = s.astype(np.int64)
                n = len(s64)
                if n == 0:
                    continue
                wins = np.arange(n) // window
                nw = int(wins[-1]) + 1
                counts = np.bincount(wins, minlength=nw)
                sumsq = np.bincount(
                    wins, weights=(s64 * s64).astype(np.float64), minlength=nw
                )
                cross = (s64[1:] * s64[:-1] < 0).astype(np.float64)
                zcr = np.bincount(wins[1:], weights=cross, minlength=nw)
                out["doc_id"].extend([doc_id] * nw)
                out["win"].extend(range(nw))
                out["n"].extend(counts.astype(np.int64))
                out["sum_sq"].extend(sumsq.astype(np.int64))
                out["zcr"].extend(zcr.astype(np.int64))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_frames, schema=WAV_WINDOW_SCHEMA)


def make_wav_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, blob): deterministic PCM WAV payloads, Arrow-batched."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob": pdf[id_col].map(lambda i: encode_wav_pcm16(int(i))),
                }
            )

    return df.select(id_col).mapInPandas(_encode, schema="doc_id long, blob binary")


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


#: output schema of :func:`ppm_resize_features`
PPM_RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, out_w int, out_h int,"
    " mean_r double, mean_g double, mean_b double, checksum long"
)


def resize_nn(img, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (h, w, c) numpy image: output
    pixel (y, x) samples source pixel ((y·h)//out_h, (x·w)//out_w) —
    the standard floor mapping, pure integer index arithmetic, which
    is what lets the DuckDB oracle state the resized statistics in
    closed form for the gradient test images."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    sy = (np.arange(out_h) * h) // out_h
    sx = (np.arange(out_w) * w) // out_w
    return img[sy][:, sx]


def ppm_resize_features(blobs: DataFrame, out_h: int = 4, out_w: int = 4) -> DataFrame:
    """Arrow-batched decode → nearest-neighbor resize → stats: the
    'resize' stage of the multimodal pipeline made REAL (decode_ppm
    parses the binary, resize_nn samples it, the stats attest every
    resized pixel via the integer checksum)."""
    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_ppm(bytes(blob))
                h, w, _ = img.shape
                small = resize_nn(img, out_h, out_w)
                flat = small.reshape(-1, 3).astype(np.int64)
                sums = flat.sum(axis=0)
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        out_w,
                        out_h,
                        sums[0] / (out_h * out_w),
                        sums[1] / (out_h * out_w),
                        sums[2] / (out_h * out_w),
                        int(flat.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "src_w",
                    "src_h",
                    "out_w",
                    "out_h",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "checksum",
                ],
            )

    return blobs.mapInPandas(_resize, schema=PPM_RESIZE_SCHEMA)
