"""Multimodal column operators: image/audio/video as opaque `binary`
columns with typed metadata, processed through Arrow-batched pandas
iterators (`mapInPandas`).

The Spark-side plumbing — schema, batch iteration, partition sizing —
is real and tested. Decode is REAL for one uncompressed family per
modality, all pure Python with no external media libs:
- images: the PPM family (`decode_ppm`: P3 ASCII and P6 binary) —
  features derive from actual pixels (dimensions + per-channel
  mean/std);
- audio: RIFF/WAVE PCM16 (`decode_wav`: chunk walk, fmt/data parse) —
  features derive from actual samples (duration, rate, count, mean,
  RMS, peak);
- video: YUV4MPEG2 (`decode_y4m`: stream-header parse + planar C420/
  C444 frame walk) — features derive from actual luma planes (dims,
  frame count, fps, luma mean/std).
Payload kinds the runtime cannot decode (compressed formats) fall back
to a deterministic hash-derived stand-in — or raise in strict mode.
Swapping in a richer decoder (PIL, torchaudio, pyav) changes only the
inner per-payload function, not the plan: the operator is already
shaped for 100 TB (mapInPandas streams Arrow batches, memory bounded by
batch size, not partition size; no shuffle introduced).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_ppm(payload: bytes | None) -> dict | None:
    """Pure-Python decoder for the PPM image family (netpbm): P3 (ASCII)
    and P6 (binary), maxval ≤ 255, `#` comments allowed in the header.
    Returns {"width", "height", "means": [r,g,b], "stds": [r,g,b]}
    (population std) or None when the payload is not PPM.

    All statistics are EXACT-integer sums divided once in double
    precision (sum/n, sqrt(sumsq/n - mean²)) — the same single-IEEE-op
    sequence a SQL oracle computes, so features are engine-portable."""
    if payload is None:
        return None
    payload = bytes(payload)
    if payload[:2] not in (b"P3", b"P6"):
        return None
    binary = payload[:2] == b"P6"

    # header = magic, width, height, maxval as whitespace-separated
    # tokens with '#'-to-EOL comments; for P6 pixel bytes start after
    # the single whitespace following maxval
    tokens: list[int] = []
    i = 2
    n = len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j : j + 1].isdigit():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(tokens) < 3:
        return None
    width, height, maxval = tokens
    if maxval <= 0 or maxval > 255 or width <= 0 or height <= 0:
        return None
    count = width * height * 3
    if binary:
        # one whitespace byte after maxval per spec; tolerate CRLF from
        # Windows writers (consume both, else the pixel stream shifts by
        # one byte and every channel silently rotates)
        if payload[i : i + 2] == b"\r\n":
            i += 2
        else:
            i += 1
        pixels = list(payload[i : i + count])
    else:
        body = payload[i:]
        # strip comments, then split on whitespace
        lines = [ln.partition(b"#")[0] for ln in body.splitlines()]
        vals = b" ".join(lines).split()
        try:
            pixels = [int(v) for v in vals[:count]]
        except ValueError:
            return None  # corrupt body → not decodable, never raise
    if len(pixels) < count:
        return None
    if any(p < 0 or p > maxval for p in pixels):
        return None  # out-of-range samples violate the format
    means, stds = [], []
    npix = width * height
    for ch in range(3):
        chan = pixels[ch:count:3]
        s = sum(chan)  # exact int
        sq = sum(v * v for v in chan)  # exact int
        mean = s / npix
        var = sq / npix - mean * mean
        means.append(mean)
        stds.append(math.sqrt(var if var > 0 else 0.0))
    return {"width": width, "height": height, "means": means, "stds": stds}


def decode_wav(payload: bytes | None) -> dict | None:
    """Pure-Python decoder for RIFF/WAVE PCM16: walks the word-aligned
    chunk list, requires a fmt chunk declaring format 1 (integer PCM)
    with 16-bit samples, and computes sample statistics over the data
    chunk. Returns {"channels", "sample_rate", "n_samples",
    "duration_ms", "mean", "rms", "peak"} or None when the payload is
    not decodable WAV (never raises on corrupt bytes).

    Statistics are EXACT-integer sums over the int16 samples with a
    single IEEE division each (sum/n, sqrt(sumsq/n), n_frames·1000 /
    rate) — the same op sequence a SQL oracle computes, so features are
    engine-portable."""
    if payload is None:
        return None
    import struct

    b = bytes(payload)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, channels, rate, _byterate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_fmt != 1 or bits != 16 or channels <= 0 or rate <= 0:
        return None
    n = len(data) // 2
    if n == 0 or n % channels != 0:
        return None
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    s = sum(samples)  # exact int
    sq = sum(v * v for v in samples)  # exact int
    n_frames = n // channels
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": (n_frames * 1000) / rate,
        "mean": s / n,
        "rms": math.sqrt(sq / n),
        "peak": float(max(abs(v) for v in samples)),
    }


def decode_y4m(payload: bytes | None) -> dict | None:
    """Pure-Python decoder for YUV4MPEG2 (y4m) — the uncompressed video
    container (ffmpeg's raw interchange format): ASCII stream header
    `YUV4MPEG2 W<w> H<h> F<n>:<d> [C<space>]`, then per frame a `FRAME`
    line followed by planar YUV bytes. Supports C420 (and its jpeg/
    mpeg2/paldv siblings; even dimensions) and C444; C420 is the
    default when no C tag is present, per spec. Returns {"width",
    "height", "fps", "n_frames", "y_mean", "y_std"} with luma statistics
    over ALL frames, or None when the payload is not decodable y4m
    (never raises on corrupt bytes).

    Luma statistics are EXACT-integer sums with single IEEE divisions
    (sum/n, sqrt(sumsq/n − mean²)) — the WAV/PPM portability discipline,
    so features are engine-checkable from the generative formula."""
    if payload is None:
        return None
    b = bytes(payload)
    magic = b"YUV4MPEG2"
    if not b.startswith(magic):
        return None
    eol = b.find(b"\n")
    if eol < 0:
        return None
    width = height = fps_num = None
    fps_den = 1
    colorspace = "C420"
    for tok in b[len(magic):eol].split(b" "):
        if not tok:
            continue
        try:
            if tok[:1] == b"W":
                width = int(tok[1:])
            elif tok[:1] == b"H":
                height = int(tok[1:])
            elif tok[:1] == b"F":
                num, _, den = tok[1:].partition(b":")
                fps_num, fps_den = int(num), int(den or b"1")
            elif tok[:1] == b"C":
                colorspace = tok.decode("ascii")
        except (ValueError, UnicodeDecodeError):
            return None
    if not width or not height or width <= 0 or height <= 0:
        return None
    if fps_den <= 0 or (fps_num is not None and fps_num < 0):
        return None  # corrupt rate header (zero OR negative) — never raise
    if colorspace.startswith("C420"):
        if width % 2 or height % 2:
            return None
        frame_bytes = width * height + 2 * ((width // 2) * (height // 2))
    elif colorspace.startswith("C444"):
        frame_bytes = 3 * width * height
    else:
        return None  # C422/mono/other: not supported by this decoder

    luma_n = width * height
    pos = eol + 1
    n_frames = 0
    s = sq = 0  # exact ints
    while pos < len(b):
        if b[pos : pos + 5] != b"FRAME":
            return None
        feol = b.find(b"\n", pos)
        if feol < 0:
            return None
        pos = feol + 1
        frame = b[pos : pos + frame_bytes]
        if len(frame) < frame_bytes:
            return None  # truncated frame
        for v in frame[:luma_n]:
            s += v
            sq += v * v
        n_frames += 1
        pos += frame_bytes
    if n_frames == 0:
        return None
    n = n_frames * luma_n
    mean = s / n
    var = sq / n - mean * mean
    return {
        "width": width,
        "height": height,
        "fps": fps_num / fps_den if fps_num else 0.0,
        "n_frames": n_frames,
        "y_mean": mean,
        "y_std": math.sqrt(var if var > 0 else 0.0),
    }


def _fake_decode(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for decode→embed on payload kinds this
    runtime can't decode: md5-derived floats. Replace with the real
    library call; the Spark plan is unchanged."""
    if payload is None:
        return None
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dims]]


def _feature(payload: bytes | None, strict: bool, dims: int) -> list[float] | None:
    decoded = decode_ppm(payload)
    if decoded is not None:
        return [
            float(decoded["width"]),
            float(decoded["height"]),
            *decoded["means"],
            *decoded["stds"],
        ]
    wav = decode_wav(payload)
    if wav is not None:
        return [
            wav["duration_ms"],
            float(wav["sample_rate"]),
            float(wav["n_samples"]),
            wav["mean"],
            wav["rms"],
            wav["peak"],
        ]
    vid = decode_y4m(payload)
    if vid is not None:
        return [
            float(vid["width"]),
            float(vid["height"]),
            float(vid["n_frames"]),
            vid["fps"],
            vid["y_mean"],
            vid["y_std"],
        ]
    if strict:
        raise NotImplementedError(
            "payload is not a decodable format (PPM image / PCM16 WAV / Y4M "
            "video); compressed-media decoders require libraries not present "
            "in this runtime"
        )
    return _fake_decode(payload, dims)


def extract_features(media: DataFrame, strict: bool = False, dims: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow batches in, Arrow
    batches out; executor memory is bounded by the Arrow batch size.
    PPM payloads go through the REAL pixel decoder (dims, per-channel
    mean/std → 8-float feature) and PCM16 WAV payloads through the REAL
    sample decoder (duration/rate/count/mean/rms/peak → 6-float
    feature); undecodable payloads use the declared hash stand-in (or
    raise when strict=True)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(lambda b: _feature(b, strict, dims)),
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_signatures(media: DataFrame) -> DataFrame:
    """Per-FRAME content signatures from the REAL y4m decoder — the
    video analog of exact text dedup: one row per decoded frame with the
    luma plane's md5 content key (over the byte values as a CSV string,
    so a SQL oracle can rebuild the identical key from a generative
    formula — engine md5 of raw BLOBs is not portable to reconstruction)
    plus exact integer luma moments. Downstream groupBy(frame_key) finds
    frames duplicated WITHIN and ACROSS videos — stock-footage/intro
    dedup, the mirror of llm_dedup_exact for the video modality.

    Plan shape: one mapInPandas stage (Arrow-batched, memory bounded by
    batch size × frames-per-payload), then ordinary relational ops on
    the (media_id, frame_idx, key) rows. Non-video and undecodable
    payloads emit nothing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "media_id": [], "frame_idx": [], "width": [], "height": [],
                "frame_key": [], "y_sum": [], "y_sumsq": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                b = bytes(payload)
                meta = decode_y4m(b)
                if meta is None:
                    continue
                w, h = meta["width"], meta["height"]
                luma_n = w * h
                frame_bytes = luma_n + 2 * ((w // 2) * (h // 2))
                pos = b.find(b"\n") + 1
                fidx = 0
                while pos < len(b):
                    feol = b.find(b"\n", pos)
                    frame = b[feol + 1 : feol + 1 + frame_bytes]
                    luma = frame[:luma_n]
                    key = hashlib.md5(
                        ",".join(str(v) for v in luma).encode()
                    ).hexdigest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fidx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["frame_key"].append(key)
                    rows["y_sum"].append(sum(luma))
                    rows["y_sumsq"].append(sum(v * v for v in luma))
                    fidx += 1
                    pos = feol + 1 + frame_bytes
            yield pd.DataFrame(rows)

    schema = (
        "media_id long, frame_idx int, width int, height int,"
        " frame_key string, y_sum long, y_sumsq long"
    )
    return media.mapInPandas(batches, schema=schema)


def resize_plan(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Resize planning runs JVM-side (pure metadata arithmetic); only the
    pixel work would enter pandas. Emits target dims preserving aspect."""
    scale = F.least(
        F.lit(max_w) / F.col("width"), F.lit(max_h) / F.col("height"), F.lit(1.0)
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
        (F.col("width") * F.col("height") > max_w * max_h).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per planned
    frame timestamp (sequence + explode, JVM-side)."""
    n_frames = F.greatest((F.col("duration_ms") / F.lit(1000.0) * fps).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: (i * F.lit(1000.0 / fps)).cast("long"),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


def synthetic_ppm(media_id: int) -> bytes:
    """Deterministic P3 (ASCII PPM) image: width 8+(id%5), height
    6+(id%4), pixel j = (id*37 + j*11) % 256. A REAL decodable image
    payload whose generative formula a SQL oracle can also evaluate —
    so the pixel-decoded features are checkable engine-to-engine."""
    w, h = 8 + media_id % 5, 6 + media_id % 4
    body = " ".join(str((media_id * 37 + j * 11) % 256) for j in range(w * h * 3))
    return f"P3\n{w} {h}\n255\n{body}".encode()


def synthetic_wav(media_id: int) -> bytes:
    """Deterministic mono PCM16 WAV at 8 kHz: n = 64 + (id%33) samples,
    sample j = ((id·73 + j·19) mod 4096) − 2048. A REAL decodable RIFF
    payload whose generative formula a SQL oracle can also evaluate, so
    the sample-decoded features are checkable engine-to-engine (the
    bytes themselves are binary; the oracle rebuilds them via unhex for
    the size check)."""
    import struct

    n = 64 + media_id % 33
    samples = [((media_id * 73 + j * 19) % 4096) - 2048 for j in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, 8000, 16000, 2, 16,
        b"data", len(data),
    )
    return header + data


def synthetic_y4m(media_id: int) -> bytes:
    """Deterministic C420 YUV4MPEG2 clip at 25 fps: even dims
    w = 4 + 2·((id//3)%3), h = 4 + 2·((id//3)%2), 2 + (id//3)%3 frames
    (id//3 so dimensions VARY across video rows — media ids cycle kinds
    with period 3, and id%3 would freeze them); luma byte j of frame f =
    (id·31 + f·17 + j·7) mod 256, chroma byte j of frame f =
    (id·13 + f·11 + j·5) mod 256. A REAL decodable video payload whose
    generative formula a SQL oracle can also evaluate (bytes are binary;
    like WAV, only the sha literal is rebuilt at oracle-build time)."""
    k = media_id // 3
    w, h = 4 + 2 * (k % 3), 4 + 2 * (k % 2)
    n_frames = 2 + k % 3
    chroma_n = 2 * ((w // 2) * (h // 2))
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode()]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        out.append(bytes((media_id * 31 + f * 17 + j * 7) % 256 for j in range(w * h)))
        out.append(bytes((media_id * 13 + f * 11 + j * 5) % 256 for j in range(chroma_n)))
    return b"".join(out)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests. ALL THREE kinds carry
    REAL decodable payloads: image rows P3 PPM (ASCII — decodable by
    decode_ppm AND reconstructible by a DuckDB oracle as the same
    string, so sha/pixel-feature checks run engine-to-engine), audio
    rows PCM16 WAV (decode_wav), video rows C420 YUV4MPEG2
    (decode_y4m). WAV/Y4M bytes are binary, so their oracles compute
    features from the generative formulas and reconstruct only the sha
    at build time. The Spark column is BINARY either way and the Arrow
    plumbing is exactly what raw media bytes would traverse; the hash
    stand-in path keeps covering payloads no decoder accepts (see
    extract_features strict)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload = synthetic_ppm(i)
            decoded = decode_ppm(payload)  # metadata derives from the
            w, h = decoded["width"], decoded["height"]  # actual payload
            duration = None
        elif kind == "audio":
            payload = synthetic_wav(i)
            wav = decode_wav(payload)
            w = h = None
            duration = int(wav["duration_ms"])
        else:
            payload = synthetic_y4m(i)
            vid = decode_y4m(payload)
            w, h = vid["width"], vid["height"]
            duration = int(vid["n_frames"] * 1000 / vid["fps"])
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/x-portable-pixmap", "audio": "audio/wav",
                 "video": "video/x-yuv4mpeg"}[kind],  # payloads ARE y4m now
                w,
                h,
                duration,
            )
        )
    # one fat partition: pandas batches amortize; each touched partition
    # costs a Python worker round (~0.3s), which dwarfs 100-row compute.
    # repartition, NOT coalesce: under Spark 4.1 coalesce(1) on a local
    # relation falls off the fast path (~4s for 96 rows); the tiny
    # round-robin exchange is ~0.1s and AQE leaves it alone.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(max(1, n // 2048))
