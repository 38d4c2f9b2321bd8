"""Multimodal column plumbing (SURVEY.md §2.D).

Images / audio / video ride through the engine as opaque ``binary`` columns
with a typed metadata struct. The Spark-side machinery — schema, Arrow
batch shape, ``mapInPandas`` partition flow, partition sizing — is real and
tested. Codecs come in two tiers:

- **Real decoders** for the formats a pure-numpy implementation covers
  completely: uncompressed **BMP** (24/32-bit BI_RGB, top-down and
  bottom-up), binary **PPM** (P6), and PCM **WAV** (RIFF chunk walk,
  16-bit). ``decode_images`` / ``decode_audio`` run them inside
  ``mapInPandas`` — actual pixels/samples out of actual bytes, no codec
  library needed.
- **Stubs** for formats that need external codec libraries (JPEG/PNG/
  compressed audio/video — not in this container), kept behind
  ``DecodeUnavailable`` or a deterministic fake, clearly marked.

At 100 TB: binary payloads dominate row size, so the operators
``repartition`` by byte budget, never collect, and push metadata-only
predicates (width/height/codec) down to parquet before any payload reaches
Python.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "DecodeUnavailable",
    "attach_media",
    "media_stats",
    "encode_bmp",
    "encode_ppm",
    "decode_image_bytes",
    "decode_images",
    "encode_wav",
    "decode_wav_bytes",
    "decode_audio",
    "decode_image_stub",
    "extract_features_stub",
    "sample_frames_stub",
    "frame_audio_features",
]

#: Canonical multimodal column pair: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), False),  # image|audio|video
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_bytes", T.LongType(), False),
                ]
            ),
            False,
        ),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by stubbed codec steps: the Spark plumbing is complete; drop a
    real decoder (PIL/librosa/pyav) into the marked function to activate."""


def attach_media(
    df: DataFrame,
    payload_col: str,
    media_type: str = "image",
    codec: str = "synthetic",
    duration_ms: Column | None = None,
) -> DataFrame:
    """Wrap an existing binary column into the canonical media struct.

    Metadata is computed JVM-side (octet_length); deterministic fake
    width/height derive from the payload hash so downstream operators have
    realistic varying values to filter on. ``duration_ms`` overrides the
    hash-derived fake duration with a caller-supplied expression — a real
    ingest reads it from the container header; entries that need an
    engine-replayable grid (mm05) pass a deterministic function of the
    row key."""
    payload = F.col(payload_col)
    h = F.abs(F.xxhash64(payload))
    dur = (h % 600000) if duration_ms is None else duration_ms
    return df.withColumn(
        "media",
        F.struct(
            payload.alias("payload"),
            F.struct(
                F.lit(media_type).alias("media_type"),
                F.lit(codec).alias("codec"),
                (h % 1920 + 16).cast("int").alias("width"),
                (F.abs(F.xxhash64(payload, F.lit(1))) % 1080 + 16).cast("int").alias("height"),
                dur.cast("long").alias("duration_ms"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ).alias("meta"),
        ),
    )


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Metadata-only aggregate — never touches payloads, so column pruning
    keeps the binary out of the scan entirely."""
    m = F.col(media_col)
    return df.groupBy(m["meta"]["media_type"].alias("media_type")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(m["meta"]["n_bytes"]).cast("long").alias("total_bytes"),
        F.min(m["meta"]["width"]).alias("min_width"),
        F.max(m["meta"]["height"]).alias("max_height"),
    )


# ---------------------------------------------------------------------------
# Real codecs: uncompressed BMP + binary PPM + PCM WAV, pure numpy
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples (``(n,)`` mono or ``(n, ch)``) as a
    canonical RIFF/WAVE file (format 1 = PCM, 16-bit little-endian)."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(data), b"WAVE")
    return riff + fmt + data_hdr + data


def decode_wav_bytes(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV payload to ``(sample_rate, samples[n, ch] int16)``.

    Walks the RIFF chunk list (fmt/data chunks in any order, unknown
    chunks skipped — real encoders emit LIST/INFO etc.), PCM 16-bit only;
    anything else raises :class:`DecodeUnavailable` (the plug-in point for
    a real audio library)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecodeUnavailable("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    rate = channels = bits = audio_format = None
    data: bytes | None = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise DecodeUnavailable(f"fmt chunk too short ({size} bytes)")
            audio_format, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if audio_format is None or data is None:
        raise DecodeUnavailable("missing fmt or data chunk")
    if audio_format != 1 or bits != 16:
        raise DecodeUnavailable(
            f"only 16-bit PCM supported (format={audio_format}, bits={bits})"
        )
    usable = len(data) - len(data) % (channels * 2)
    samples = np.frombuffer(data, dtype="<i2", count=usable // 2).reshape(-1, channels)
    return rate, samples


def decode_audio(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real WAV decode via ``mapInPandas``: adds ``sample_rate``,
    ``n_samples``, ``n_channels``, ``duration_ms``, ``sum_sq`` (Σ sample²
    over all channels — exact integer, hash-stable) and ``peak``
    (max |sample|). Undecodable payloads yield nulls, not failures."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("sum_sq", T.LongType(), True),
            T.StructField("peak", T.IntegerType(), True),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in
                ("sample_rate", "n_samples", "n_channels", "duration_ms", "sum_sq", "peak")}
            for m in pdf[media_col]:
                try:
                    rate, samples = decode_wav_bytes(m["payload"])
                except (DecodeUnavailable, ValueError, TypeError, struct.error):
                    for k in cols:
                        cols[k].append(None)
                    continue
                n, ch = samples.shape
                s64 = samples.astype(np.int64)
                cols["sample_rate"].append(rate)
                cols["n_samples"].append(n)
                cols["n_channels"].append(ch)
                cols["duration_ms"].append(int(n * 1000 // rate) if rate else None)
                cols["sum_sq"].append(int((s64 * s64).sum()))
                cols["peak"].append(int(np.abs(s64).max()) if n else 0)
            pdf = pdf.copy()
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(decode, out_schema)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an ``HxWx3`` uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, BI_RGB, bottom-up rows, 4-byte row padding)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp expects HxWx3, got {a.shape}")
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = a[::-1, :, ::-1].reshape(h, row_bytes)  # bottom-up, BGR
    return header + info + rows.tobytes()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an ``HxWx3`` uint8 RGB array as binary PPM (P6, maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_ppm expects HxWx3, got {a.shape}")
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise DecodeUnavailable("BMP payload shorter than its headers")
    _, _, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    hdr_size, w, h, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40:
        raise DecodeUnavailable(f"BMP header size {hdr_size} (BITMAPCOREHEADER) not supported")
    if compression != 0:
        raise DecodeUnavailable(f"compressed BMP (method {compression}) not supported")
    if bpp not in (24, 32):
        raise DecodeUnavailable(f"{bpp}-bit BMP not supported (24/32 only)")
    top_down = h < 0
    h = abs(h)
    nchan = bpp // 8
    stride = (w * nchan + 3) // 4 * 4
    need = data_offset + stride * h
    if len(payload) < need:
        raise DecodeUnavailable(f"truncated BMP: {len(payload)} bytes, need {need}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : w * nchan].reshape(h, w, nchan)
    rgb = rows[:, :, 2::-1]  # BGR(A) → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _decode_ppm(payload: bytes) -> np.ndarray:
    # Header: P6, then w, h, maxval as whitespace-separated tokens with
    # '#' comments; a single whitespace byte ends the header.
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise DecodeUnavailable("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise DecodeUnavailable(f"PPM maxval {maxval} not supported (255 only)")
    need = w * h * 3
    if len(payload) - pos < need:
        raise DecodeUnavailable(f"truncated PPM: {len(payload) - pos} of {need} bytes")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode a BMP or P6-PPM payload (sniffed by magic) to ``HxWx3`` uint8
    RGB. Raises :class:`DecodeUnavailable` for any other format — that is
    where a PIL/opencv decoder plugs in."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise DecodeUnavailable(
        "unrecognized image format (BMP/PPM decode natively; JPEG/PNG need "
        "an external codec library)"
    )


def _resize_nearest(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w, _ = rgb.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return rgb[yi][:, xi]


def decode_images(
    df: DataFrame,
    media_col: str = "media",
    out_w: int | None = None,
    out_h: int | None = None,
) -> DataFrame:
    """Real decode (+ optional nearest-neighbor resize) via ``mapInPandas``.

    Adds ``width``/``height`` (source dimensions) and ``pixels`` — the
    decoded (or resized) image flattened row-major as RGB ints. Arrow moves
    the binary batches; numpy does the pixel work; undecodable payloads
    yield null pixels rather than failing the partition (curation-filter
    semantics: bad files are data, not crashes)."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, pixels = [], [], []
            for m in pdf[media_col]:
                try:
                    rgb = decode_image_bytes(m["payload"])
                except (DecodeUnavailable, ValueError, TypeError):
                    widths.append(None), heights.append(None), pixels.append(None)
                    continue
                h, w, _ = rgb.shape
                if out_w is not None and out_h is not None:
                    rgb = _resize_nearest(rgb, out_w, out_h)
                widths.append(w)
                heights.append(h)
                pixels.append(rgb.reshape(-1).astype("int64").tolist())
            pdf = pdf.copy()
            pdf["width"], pdf["height"], pdf["pixels"] = widths, heights, pixels
            yield pdf

    return df.mapInPandas(decode, out_schema)


def _fake_pixels(payload: bytes, out_w: int, out_h: int) -> list[int]:
    # Deterministic stand-in for a real decode+resize: byte histogram folded
    # to out_w*out_h "pixels". Replace with PIL decode in production.
    if not payload:
        return [0] * (out_w * out_h)
    n = out_w * out_h
    return [payload[i % len(payload)] for i in range(n)]


def decode_image_stub(
    df: DataFrame, media_col: str = "media", out_w: int = 8, out_h: int = 8, fake: bool = True
) -> DataFrame:
    """Decode+resize via ``mapInPandas`` — Arrow-batched, partition-parallel.

    The batch shape (payload bytes in, fixed-size pixel array out) is the
    real contract a PIL/torchvision decoder plugs into; ``fake=True`` uses
    the deterministic stand-in, ``fake=False`` raises DecodeUnavailable at
    the first batch (STUB — no image libs in this container)."""
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("pixels", T.ArrayType(T.IntegerType()), False)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise DecodeUnavailable(
                    "image decode requires PIL/opencv — not in this container; "
                    "swap _fake_pixels for a real decoder"
                )
            media = pdf[media_col]
            pdf = pdf.copy()
            pdf["pixels"] = [
                _fake_pixels(m["payload"], out_w, out_h) if m is not None else None
                for m in media
            ]
            yield pdf

    return df.mapInPandas(decode, out_schema)


def extract_features_stub(df: DataFrame, media_col: str = "media", dim: int = 16) -> DataFrame:
    """Feature extraction (embedding) stub: deterministic hash-fold of the
    payload to a ``dim``-float vector via mapInPandas. Swap the body for a
    real model forward pass; the schema/batching/partitioning stays."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), False)]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                payload = m["payload"] if m is not None else b""
                # integer byte sums + ONE division: every component is an
                # exactly-representable n/255.0, so the fold is engine-
                # portable (the SQL oracle reproduces it bit-for-bit; an
                # incremental float fold would drift by accumulation order)
                acc = [0] * dim
                for i, byte in enumerate(payload[: 4096]):
                    acc[i % dim] += byte
                feats.append([a / 255.0 for a in acc])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(extract, out_schema)


def sample_frames_stub(
    df: DataFrame, media_col: str = "media", every_ms: int = 1000
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    offset (explode of the timestamp grid, JVM-side) with a stubbed frame
    payload slice. The explode-then-decode shape is the real pipeline; only
    the codec is fake."""
    m = F.col(media_col)
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(m["meta"]["duration_ms"] - 1, F.lit(0).cast("long")),
        F.lit(every_ms).cast("long"),
    )
    return (
        df.withColumn("frame_ms", F.explode(frames))
        .withColumn(
            "frame_payload",
            F.substring(
                m["payload"], (F.col("frame_ms") % 32 + 1).cast("int"), 16
            ),  # STUB: real impl seeks the container format
        )
        .select("*")
    )


def frame_audio_features(
    df: DataFrame,
    media_col: str = "media",
    frame: int = 64,
    hop: int = 64,
) -> DataFrame:
    """Frame-level audio features via the real WAV decode: split each
    decoded PCM signal into ``frame``-sample windows every ``hop``
    samples and emit one row per frame with integer energy (Σ sample²),
    peak amplitude, and zero-crossing count (strict sign changes) — the
    framing front-end every audio featurizer shares (fbank/MFCC pipelines
    frame exactly like this before their per-frame transform, which would
    plug in here). Trailing partial frames are dropped (window
    semantics); undecodable payloads yield no frames.

    Integer arithmetic end to end, so the features are engine-exact
    (the mm07 oracle replays them in SQL). Arrow-batched mapInPandas,
    numpy per batch — the same scale shape as decode_audio."""
    keep = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        keep
        + [
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("sum_sq", T.LongType(), True),
            T.StructField("peak", T.IntegerType(), True),
            T.StructField("zero_crossings", T.IntegerType(), True),
        ]
    )
    keep_names = [f.name for f in keep]

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {n: [] for n in keep_names}
            fi, ss, pk, zc = [], [], [], []
            for idx, m in enumerate(pdf[media_col]):
                try:
                    _, samples = decode_wav_bytes(m["payload"])
                except (DecodeUnavailable, ValueError, TypeError):
                    continue
                s = samples.astype(np.int64)
                n_frames = 0 if len(s) < frame else (len(s) - frame) // hop + 1
                for f_i in range(n_frames):
                    w = s[f_i * hop : f_i * hop + frame]
                    for n in keep_names:
                        rows[n].append(pdf[n].iloc[idx])
                    fi.append(f_i)
                    ss.append(int((w * w).sum()))
                    pk.append(int(np.abs(w).max()))
                    zc.append(int(((w[:-1] * w[1:]) < 0).sum()))
            out = pd.DataFrame(rows)
            out["frame_idx"], out["sum_sq"], out["peak"], out["zero_crossings"] = (
                pd.array(fi, dtype="Int32"),
                pd.array(ss, dtype="Int64"),
                pd.array(pk, dtype="Int32"),
                pd.array(zc, dtype="Int32"),
            )
            yield out

    return df.mapInPandas(featurize, out_schema)
