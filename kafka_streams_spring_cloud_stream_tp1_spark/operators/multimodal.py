"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched `mapInPandas`.

The Spark-side architecture is the real deliverable here — schema
(binary + struct metadata), partition-parallel Arrow batches, Pandas
UDF signatures — while media decoding is an OPTIONAL dependency:

- `decode_image` decodes for real when Pillow is importable and
  raises NotImplementedError otherwise (this container has no image
  libs); `decode_audio` decodes RIFF/WAV for real via the stdlib
  `wave` module everywhere and gates other formats behind an
  optional soundfile import (same pattern).
- `extract_features` computes real, deterministic byte-level features
  (size, digest, magic-byte sniff) plus width/height (NULL unless a
  decodable image payload meets an installed Pillow) so the pipeline
  is end-to-end testable and oracle-checkable today.

Scale notes: payloads stay opaque `BinaryType` — Spark never
interprets them, parquet stores them efficiently, and column pruning
keeps them out of queries that only touch metadata. `mapInPandas`
streams Arrow record batches (bounded memory per task regardless of
partition size); `spark.sql.execution.arrow.maxRecordsPerBatch` caps
batch height when payloads are large. Feature extraction is
per-row-independent → no shuffle, scales linearly with executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .hashing import fan_out

if TYPE_CHECKING:
    import pandas as pd

# magic-byte prefixes → sniffed media kind (deterministic, no decode)
_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"ID3", "audio/mp3"),
]

# RIFF is a container family, not a format: bytes 8-12 name the form.
# WebP and AVI are RIFF too — labeling all RIFF as audio/wav mislabels
# them and routes them into wave.open (ADVICE r04).
_RIFF_FORMS = {
    b"WAVE": "audio/wav",
    b"WEBP": "image/webp",
    b"AVI ": "video/avi",
}

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [StructField("mime", StringType()), StructField("n_bytes", LongType())]
            ),
        ),
    ]
)


def decode_image(payload: bytes) -> object:
    """Decode image bytes to a PIL.Image — OPTIONAL dependency: when
    Pillow is importable the decode is real; otherwise raises
    NotImplementedError (this container ships no image libs). Callers
    gate on `kind.startswith('image/')` and treat NotImplementedError
    as 'undecodable'; tests skip cleanly when Pillow is absent (same
    gate pattern as the Kafka-broker / protobuf skips)."""
    try:
        from PIL import Image  # noqa: PLC0415 (optional, worker-side)
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow (optional; not in this container)"
        ) from exc
    import io

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes) -> dict:
    """Decode audio bytes to ``{n_channels, sample_rate, n_frames,
    duration_s}``. RIFF/WAV parses via the stdlib ``wave`` module —
    always available, so the WAV path is REAL decode with zero
    optional deps. Other containers (mp3/ogg/flac) need ``soundfile``
    — optional, same gate pattern as `decode_image`: importable →
    real decode, absent → NotImplementedError, callers treat it as
    'undecodable'."""
    import io

    # Only RIFF/WAVE goes through stdlib `wave`; WebP/AVI are RIFF
    # containers too and would raise wave.Error instead of this
    # function's documented NotImplementedError contract (ADVICE r04).
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            nf, sr = w.getnframes(), w.getframerate()
            return {
                "n_channels": w.getnchannels(),
                "sample_rate": sr,
                "n_frames": nf,
                "duration_s": nf / sr if sr else None,
            }
    try:
        import soundfile  # noqa: PLC0415 (optional, worker-side)
    except ImportError as exc:
        raise NotImplementedError(
            "non-WAV audio decoding requires soundfile (optional; not in this container)"
        ) from exc
    info = soundfile.info(io.BytesIO(payload))
    return {
        "n_channels": int(info.channels),
        "sample_rate": int(info.samplerate),
        "n_frames": int(info.frames),
        "duration_s": float(info.duration),
    }


def _sniff(payload: bytes) -> str:
    if payload.startswith(b"RIFF"):
        return _RIFF_FORMS.get(payload[8:12], "application/octet-stream")
    for magic, kind in _MAGIC:
        if payload.startswith(magic):
            return kind
    return "application/octet-stream"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct
    from the documents fixture (stand-in for real media bytes; the
    engine-side plumbing — BinaryType column, metadata struct — is
    identical for true image/audio payloads)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return fan_out(df).select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"), F.octet_length(payload).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Byte
    features (size, digest, magic sniff) are always real and
    deterministic; width/height are decoded via `decode_image` for
    image/* payloads when Pillow is present and NULL otherwise (no
    Pillow, non-image, or corrupt bytes) — so the schema is stable
    across environments and the fixture corpus (text payloads)
    oracle-checks identically with or without the optional dep."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def dims(b: bytes) -> tuple:
            if not _sniff(b).startswith("image/"):
                return (None, None)
            try:
                img = decode_image(b)
                return (int(img.width), int(img.height))
            except Exception:  # NotImplementedError (no Pillow) or corrupt bytes
                return (None, None)

        for pdf in it:
            payloads = pdf["payload"]
            wh = [(None, None) if b is None else dims(bytes(b)) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in payloads],
                        dtype="Int64",
                    ),
                    "digest": payloads.map(
                        lambda b: None if b is None else hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "kind": payloads.map(lambda b: None if b is None else _sniff(bytes(b))),
                    "width": pd.array([w for w, _ in wh], dtype="Int64"),
                    "height": pd.array([h for _, h in wh], dtype="Int64"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def attach_wav_payload(
    df: DataFrame, text_col: str = "text", sample_rate: int = 8000
) -> DataFrame:
    """Synthesize a REAL RIFF/WAV payload per document — 8-bit PCM
    mono at ``sample_rate``, the document's UTF-8 bytes as samples.
    Gives the audio lane true end-to-end coverage (header write →
    magic sniff → `wave` decode) with zero optional deps, and makes
    the decoded stats arithmetically predictable (n_frames =
    octet_length(text)), so a DuckDB oracle can verify the decode.
    Same per-row-independent mapInPandas shape as real media
    ingestion: no shuffle, Arrow-batched, linear in executors."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import pandas as pd

        def to_wav(t) -> bytes | None:
            # NULL text → NULL payload (downstream sniff/decode yields
            # NULL features), matching the SQL-side octet_length(
            # encode(text)) NULL propagation; raising inside the Arrow
            # batch would fail the whole task (ADVICE r04).
            if t is None:
                return None
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(1)
                w.setframerate(sample_rate)
                w.writeframes(t.encode("utf-8"))
            return buf.getvalue()

        for pdf in it:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf[text_col].map(to_wav)}
            )

    return fan_out(df).select("doc_id", text_col).mapInPandas(
        batches, "doc_id long, payload binary"
    )


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched `decode_audio` over a binary payload column:
    (n_channels, sample_rate, n_frames, duration_s), NULL for
    non-audio or undecodable payloads — stable schema with or without
    the optional soundfile dep (WAV decodes via stdlib `wave`
    everywhere). duration_s is the raw nf/sr double (exact-integer
    ratio → bit-identical cross-engine)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def feats(b: bytes) -> tuple:
            if not _sniff(b).startswith("audio/"):
                return (None, None, None, None)
            try:
                d = decode_audio(b)
            except Exception:  # NotImplementedError (no soundfile) or corrupt
                return (None, None, None, None)
            return (d["n_channels"], d["sample_rate"], d["n_frames"], d["duration_s"])

        for pdf in it:
            rows = [
                (None, None, None, None) if b is None else feats(bytes(b))
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_channels": pd.array([r[0] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[1] for r in rows], dtype="Int32"),
                    "n_frames": pd.array([r[2] for r in rows], dtype="Int64"),
                    "duration_s": pd.array([r[3] for r in rows], dtype="Float64"),
                }
            )

    return df.mapInPandas(
        batches,
        "doc_id long, n_channels int, sample_rate int, n_frames long, duration_s double",
    )


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing (video analog): emit evenly spaced byte
    offsets per payload — the real version decodes frames at these
    offsets; the offset arithmetic, explode shape, and per-frame row
    schema are the production plan."""
    # an empty payload still yields frame 0 at offset 0 (sequence(0,0)
    # = [0]) — deliberate: a zero-byte asset is one (undecodable)
    # frame, and the DuckDB oracle's range(0, least(n//s, m-1)+1)
    # agrees on that boundary
    n_frames = F.expr(f"meta.n_bytes div {every_n_bytes}")  # exact int div
    offsets = F.transform(
        F.sequence(F.lit(0), F.least(n_frames, F.lit(max_frames - 1)).cast("int")),
        lambda i: (i * every_n_bytes).cast("bigint"),
    )
    return df.select("doc_id", F.posexplode(offsets).alias("frame_idx", "byte_offset"))


def resize_payloads(
    df: DataFrame, target_bytes: int = 64
) -> DataFrame:
    """Resize plumbing (image-thumbnail analog): downsample each binary
    payload to ≤ ``target_bytes`` by keeping evenly spaced bytes — the
    deterministic stand-in for a real pixel resize (which would
    `decode_image` → interpolate → re-encode inside the same Arrow
    batch loop; the container has no image libs, see decode_image).
    The engine-side shape is the production one: BinaryType in,
    BinaryType + updated metadata struct out, vectorized mapInPandas,
    no shuffle — at 100 TB this is a pure scan-transform stage whose
    output is ~target/source of the input bytes (the whole point of
    thumbnailing before shipping to GPU feature extractors)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def shrink(b) -> bytes | None:
            if b is None:  # NULL payload passes through as NULL
                return None
            b = bytes(b)
            if len(b) <= target_bytes:
                return b
            # evenly spaced byte sample, first byte always kept
            step = len(b) / target_bytes
            return bytes(b[int(i * step)] for i in range(target_bytes))

        def nbytes(b):
            return None if b is None else len(b)

        for pdf in it:
            out = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "orig_bytes": pdf["payload"].map(nbytes).astype("Int64"),
                    "new_bytes": out.map(nbytes).astype("Int64"),
                }
            )

    return df.mapInPandas(
        batches, "doc_id long, payload binary, orig_bytes long, new_bytes long"
    )
