"""Multimodal column plumbing (training-data pipeline op).

Image/audio/video ride as opaque ``binary`` columns + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas.

IMAGE decode is REAL as of round 3: the engine ships its own PNG, JPEG
and WebP codecs (functions/png.py, jpeg.py, webp.py), and
``attach_real_images`` / ``decode_image_features`` below push actual
compressed bytes through shuffles and decode them executor-side
(driver-checked: `multimodal_decode`). AUDIO decode is REAL for PCM:
own WAV codec (functions/wav.py, driver-checked: `audio_decode`).
VIDEO decode is REAL as of round 6 for the two codec-free AVI flavors:
own RIFF/AVI container parser (functions/avi.py) with MJPG (in-house
T.81 frames) and uncompressed BI_RGB DIB payloads, driver-checked via
`video_decode`. COMPRESSED audio (MP3/AAC) and compressed video
(H.264/VP9/AV1) remain stubbed (ffmpeg-bound — clearly marked):
``decoder='fake'`` produces a deterministic pseudo-decode so that
plumbing is still tested end-to-end; ``decoder='real'`` on such
payloads raises NotImplementedError where ffmpeg would go.

Schema convention:
    media: binary                      -- opaque payload
    media_meta: struct<kind:string, width:int, height:int,
                       n_frames:int, sample_rate:int>
    features: array<float>             -- extractor output
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "kind string, width int, height int, n_frames int, sample_rate int"
)

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Deterministic pseudo-media: payload bytes + synthetic metadata
    derived from the payload (sandbox stand-in for WARC image records)."""
    return (
        df.withColumn("media", F.encode(F.col(payload_col), "UTF-8"))
        .withColumn(
            "media_meta",
            F.struct(
                F.lit("image").alias("kind"),
                (F.length(payload_col) % 640 + 16).alias("width"),
                (F.length(payload_col) % 480 + 16).alias("height"),
                F.lit(1).alias("n_frames"),
                F.lit(0).alias("sample_rate"),
            ),
        )
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode: payload md5 seeds a tiny
    uint8 'pixel' array of the declared shape (capped for tests)."""
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(min(height, 32), min(width, 32)), dtype=np.uint8)


def extract_features(
    df: DataFrame, decoder: str = "fake", method: str = "hist"
) -> DataFrame:
    """media binary → features via mapInPandas.

    The batch shape/partitioning is production-real; only the pixel
    decode is substituted. ``decoder='real'`` marks where PIL/ffmpeg
    plug in.

    ``method``:
      - ``'hist'``  — histogram of the (fake-)decoded pixels,
        ``array<float>`` (the shape a real extractor produces);
      - ``'digest'`` — the i-th md5 byte of the payload / 255.0,
        ``array<double>``. Same per-row decode-style cost shape, but
        engine-portable: an ANSI-SQL oracle can recompute it exactly
        (md5 hex substrings), which the driver's value-hash gate needs.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    if method not in ("hist", "digest"):
        raise ValueError("method must be 'hist' or 'digest'")

    def gen(batches):
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["media"], pdf["media_meta"]):
                if decoder == "real":
                    raise NotImplementedError(
                        "real image decode requires PIL/ffmpeg (absent in "
                        "this container); use decoder='fake'"
                    )
                raw = bytes(payload)
                if method == "digest":
                    dig = hashlib.md5(raw).digest()[:FEATURE_DIM]
                    feats.append([b / 255.0 for b in dig])
                    continue
                img = _fake_decode(raw, meta["width"], meta["height"])
                # histogram-ish feature vector (vectorized numpy)
                hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                feats.append((hist / max(img.size, 1)).astype(np.float32).tolist())
            out = pdf[["doc_id"]].copy()
            out["features"] = feats
            yield out

    ftype = "array<double>" if method == "digest" else "array<float>"
    return df.mapInPandas(gen, schema=f"doc_id bigint, features {ftype}")


def frame_sample(df: DataFrame, every_n: int = 2, decoder: str = "fake") -> DataFrame:
    """Video-style frame sampling: one row per sampled frame.

    ``decoder='real'`` (r6) decodes the ``media`` column as an actual
    video payload — an AVI container (functions/avi.py — MJPG / BI_RGB
    streams) or an animated GIF (functions/gif.py — full disposal-
    method compositing; the web's accidental video format) — and emits
    every ``every_n``-th frame's raw RGB bytes; ``media_meta`` is not
    consulted (the payloads are self-describing). Truly compressed
    video inside a container still raises NotImplementedError from
    the codec dispatch (ffmpeg-bound). With the fake decoder each
    'frame' is a deterministic slice of the pseudo-decode; either way
    the row-explosion shape (doc_id, frame_idx, frame binary) is the
    real contract a video pipeline needs."""

    def gen(batches):
        from ..functions.avi import decode_avi
        from ..functions.gif import decode_gif_frames
        from ..functions.png import decode_apng_frames
        from ..functions.webp import decode_webp_frames

        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_meta"]
            ):
                if decoder == "real":
                    raw = bytes(payload)
                    if raw[:6] in (b"GIF87a", b"GIF89a"):
                        # RGBA composites → drop alpha for the frame
                        # contract (GIF transparency is already
                        # composited into the canvas walk)
                        frames = [
                            fr[..., :3] for fr in decode_gif_frames(raw)
                        ]
                    elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                        frames = [
                            fr[..., :3] for fr in decode_apng_frames(raw)
                        ]
                    elif raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
                        frames = [
                            fr[..., :3] for fr in decode_webp_frames(raw)
                        ]
                    elif raw[4:8] == b"ftyp":
                        from ..functions.mediainfo import decode_mp4_video

                        frames, _fps = decode_mp4_video(raw)
                    else:
                        frames, _fps = decode_avi(raw)
                    for f in range(0, len(frames), every_n):
                        rows.append(
                            (int(doc_id), f,
                             np.ascontiguousarray(frames[f]).tobytes())
                        )
                    continue
                n = max(int(meta["n_frames"]), 1)
                img = _fake_decode(bytes(payload), meta["width"], meta["height"])
                for f in range(0, n, every_n):
                    rows.append((int(doc_id), f, img.tobytes()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(gen, schema="doc_id bigint, frame_idx int, frame binary")


# ---------------------------------------------------------------------------
# REAL image decode (round 3): the engine ships its own PNG / JPEG / WebP
# codecs (functions/png.py, jpeg.py, webp.py), so the image half of the
# multimodal surface no longer needs the 'fake' substitution — actual
# compressed bytes ride the binary column through shuffles and are decoded
# back to pixels executor-side. (Video stays stubbed: ffmpeg-bound.)
# ---------------------------------------------------------------------------

IMG_SIDE = 16
_CH_MULT = (31, 57, 89)  # per-channel generators, coprime with 256


def synth_image(doc_id: int) -> np.ndarray:
    """Deterministic 16×16 RGB test image: channel c pixel i =
    (doc_id*mult_c + i) % 256 — closed form an ANSI-SQL oracle can sum."""
    i = np.arange(IMG_SIDE * IMG_SIDE, dtype=np.int64)
    chans = [
        ((doc_id * m + i) % 256).astype(np.uint8).reshape(IMG_SIDE, IMG_SIDE)
        for m in _CH_MULT
    ]
    return np.stack(chans, axis=-1)


LOSSY_QI = 40


def lossy_flat_image(v: int) -> np.ndarray:
    """Flat 16×16 RGB test image for the lossy-WebP leg: every pixel is
    (v, 3v+17, 7v+29) mod 256, so the decoded output is a pure function
    of v = doc_id % 256 and a 256-row expectation table covers it."""
    img = np.empty((IMG_SIDE, IMG_SIDE, 3), np.uint8)
    img[..., 0] = v
    img[..., 1] = (3 * v + 17) % 256
    img[..., 2] = (7 * v + 29) % 256
    return img


def lossy_expectation_table(qi: int = LOSSY_QI) -> list:
    """(v, sum_r, sum_g, sum_b) for each of the 256 flat lossy sources,
    computed by running the engine's own VP8 encode→decode round trip.
    Used by the DuckDB oracle (as a VALUES table) and by tests: a driver
    hash match then proves executor-side decode is deterministic and
    bit-identical to this reference evaluation."""
    from ..functions.vp8 import encode_webp_lossy
    from ..functions.webp import decode_webp

    rows = []
    for v in range(256):
        dec = decode_webp(encode_webp_lossy(lossy_flat_image(v), qi=qi))
        s = dec[..., :3].astype(np.int64).sum(axis=(0, 1))
        rows.append((v, int(s[0]), int(s[1]), int(s[2])))
    return rows


def _wrap_vp8x_alpha(simple_webp: bytes, v: int) -> bytes:
    """Re-wrap a simple lossy WebP as an extended (VP8X) container with
    a raw ALPH alpha plane — alpha pixel i = (v*13 + i) % 256.  The
    decode features sum RGB only, so the expectation table still
    covers these rows; the wrap drives the container/ALPH path through
    the driver gate."""
    import struct as _s

    pos = 12
    vp8 = None
    while pos + 8 <= len(simple_webp):
        tag = simple_webp[pos : pos + 4]
        (size,) = _s.unpack("<I", simple_webp[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            vp8 = simple_webp[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if vp8 is None:
        raise ValueError("no VP8 chunk to wrap")
    alpha = ((v * 13 + np.arange(IMG_SIDE * IMG_SIDE, dtype=np.int64))
             % 256).astype(np.uint8).tobytes()

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + _s.pack("<I", len(payload)) + payload + pad

    body = (
        b"WEBP"
        + chunk(
            b"VP8X",
            bytes([0x10, 0, 0, 0])
            + (IMG_SIDE - 1).to_bytes(3, "little")
            + (IMG_SIDE - 1).to_bytes(3, "little"),
        )
        + chunk(b"ALPH", bytes([0]) + alpha)
        + chunk(b"VP8 ", vp8)
    )
    return b"RIFF" + _s.pack("<I", len(body)) + body


def attach_real_images(df: DataFrame) -> DataFrame:
    """doc_id → actual encoded image bytes in the ``media`` column,
    split by doc_id%8: 0 → truecolor PNG, 4 → 24-bit BMP (r6), 1 →
    lossless WebP (VP8L), 5 → ICO favicon container (r6, 32-bit BMP
    entry with AND mask), 2 → GIF89a, 6 → striped DEFLATE RGB TIFF
    (r6, sources/geotiff.py encoder twin), 3/7 → lossy WebP (VP8 key
    frame, functions/vp8.py; the %8==7 half rides an extended VP8X
    container with a raw ALPH alpha plane).  The six lossless codecs
    carry the closed-form synth_image (byte-exact round trip — a 16×16
    image has ≤256 pixels so the GIF palette is exact); the lossy legs
    carry a FLAT image keyed by doc_id%256 so their decode is covered
    by lossy_expectation_table()."""
    from ..functions.bmp import encode_bmp, encode_ico
    from ..functions.gif import encode_gif
    from ..functions.png import encode_rgb_png
    from ..functions.vp8 import encode_webp_lossy
    from ..functions.webp import encode_webp
    from ..sources.geotiff import encode_geotiff

    def gen(batches):
        lossy_cache: dict[int, bytes] = {}
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = d % 4
                if m == 3:
                    v = d % 256
                    if v not in lossy_cache:
                        lossy_cache[v] = encode_webp_lossy(
                            lossy_flat_image(v), qi=LOSSY_QI
                        )
                    payload = lossy_cache[v]
                    if d % 8 == 7:
                        payload = _wrap_vp8x_alpha(payload, v)
                elif m == 0:
                    enc = encode_rgb_png if d % 8 == 0 else encode_bmp
                    payload = enc(synth_image(d))
                elif m == 1:
                    enc = encode_webp if d % 8 == 1 else encode_ico
                    payload = enc(synth_image(d))
                elif d % 8 == 6:
                    payload = encode_geotiff(
                        synth_image(d), compress="deflate"
                    )
                else:
                    payload = encode_gif(synth_image(d))
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    return df.mapInPandas(gen, schema="doc_id bigint, media binary")


def sniff_format(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        first = payload[12:16]
        if first == b"VP8 ":
            return "webp_lossy"
        return "webp_x" if first == b"VP8X" else "webp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"\x00\x00\x01\x00":  # ICONDIR (reserved=0, type=1)
        return "ico"
    if payload[:4] in (b"II*\x00", b"II+\x00", b"MM\x00*", b"MM\x00+"):
        return "tiff"  # classic/BigTIFF, either byte order (decode is
        # little-endian only and raises loudly on MM)
    head = payload[:256].lstrip()
    if head[:5] == b"<?xml" or head[:4] == b"<svg":
        return "svg"
    raise ValueError("unknown image payload")


def decode_image_features(df: DataFrame) -> DataFrame:
    """media binary → REAL decode (magic-sniffed codec dispatch) →
    (fmt, width, height, per-channel integer pixel sums). Exact bigint
    features: order-free and lossless-codec-exact."""
    from ..functions.bmp import decode_bmp, decode_ico
    from ..functions.gif import decode_gif
    from ..functions.jpeg import decode_jpeg
    from ..functions.png import decode_rgb_png
    from ..functions.webp import decode_webp
    from ..sources.geotiff import decode_tiff

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(payload)
                fmt = sniff_format(raw)
                if fmt == "png":
                    img = decode_rgb_png(raw)
                elif fmt in ("webp", "webp_lossy", "webp_x"):
                    img = decode_webp(raw)
                elif fmt == "gif":
                    img = decode_gif(raw)
                elif fmt == "bmp":
                    img = decode_bmp(raw)
                elif fmt == "ico":
                    img = decode_ico(raw)
                elif fmt == "tiff":
                    img = np.asarray(decode_tiff(raw)[0])
                    if img.ndim == 2:
                        img = np.stack([img] * 3, -1)
                elif fmt == "svg":
                    from ..functions.svg import decode_svg

                    img = decode_svg(raw)
                else:
                    img = decode_jpeg(raw)
                sums = img[..., :3].astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (int(doc_id), fmt, img.shape[1], img.shape[0],
                     int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height",
                         "sum_r", "sum_g", "sum_b"],
            )

    return df.mapInPandas(
        gen,
        schema="doc_id bigint, fmt string, width int, height int, "
        "sum_r bigint, sum_g bigint, sum_b bigint",
    )


# ---------------------------------------------------------------------------
# REAL audio decode (r3): own WAV/PCM codec (functions/wav.py). Compressed
# audio and video remain honestly ffmpeg-stubbed.
# ---------------------------------------------------------------------------

AUDIO_N = 1024
AUDIO_RATE = 16000


def synth_audio(doc_id: int) -> np.ndarray:
    """Deterministic int16 waveform: s_i = (doc_id*9176 + i*37) % 65536
    - 32768 — closed form an ANSI-SQL oracle can aggregate."""
    i = np.arange(AUDIO_N, dtype=np.int64)
    return ((doc_id * 9176 + i * 37) % 65536 - 32768).astype(np.int16)


def attach_real_audio(df: DataFrame) -> DataFrame:
    """doc_id → actual encoded audio bytes in the ``media`` column by
    doc_id%4: 0/2 ride RIFF/WAVE PCM, 1 native FLAC (functions/
    flac.py), 3 big-endian AIFF (r6, functions/aiff.py) — all three
    lossless, so every leg decodes to the identical closed-form
    waveform and one oracle covers the trio."""
    from ..functions.aiff import encode_aiff
    from ..functions.flac import encode_flac
    from ..functions.wav import encode_wav

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                wave = synth_audio(d)
                m = d % 4
                if m == 1:
                    payload = encode_flac(wave, AUDIO_RATE)
                elif m == 3:
                    payload = encode_aiff(wave, AUDIO_RATE, bits=16)
                else:
                    payload = encode_wav(wave, AUDIO_RATE)
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    return df.mapInPandas(gen, schema="doc_id bigint, media binary")


def decode_audio_features(df: DataFrame) -> DataFrame:
    """media binary → REAL decode (magic-sniffed WAV/FLAC/AIFF
    dispatch) → exact integer amplitude stats (sum + sum of |s|:
    order-free, codec-exact)."""
    from ..functions.aiff import decode_aiff
    from ..functions.flac import decode_flac
    from ..functions.wav import decode_wav

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(payload)
                if raw[:4] == b"fLaC":
                    fmt = "flac"
                    samples, rate = decode_flac(raw, verify_md5=True)
                elif raw[:4] == b"RIFF":
                    fmt = "wav"
                    samples, rate = decode_wav(raw)
                elif raw[:4] == b"FORM":
                    fmt = "aiff"
                    samples, rate = decode_aiff(raw)
                else:
                    raise ValueError("unknown audio payload")
                s = samples[:, 0].astype(np.int64)
                rows.append(
                    (int(doc_id), fmt, rate, len(s), int(s.sum()),
                     int(np.abs(s).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "sample_rate", "n_samples",
                         "sum_amp", "sum_abs"],
            )

    return df.mapInPandas(
        gen,
        schema="doc_id bigint, fmt string, sample_rate int, "
        "n_samples int, sum_amp bigint, sum_abs bigint",
    )


# ---------------------------------------------------------------------------
# REAL video decode (r6): own AVI container (functions/avi.py) carrying
# MJPG (in-house T.81 frames, incl. the no-DHT MJPEG convention) and
# uncompressed BI_RGB DIB payloads. Truly compressed video (H.264/VP9)
# remains honestly ffmpeg-stubbed (decoder='real' in frame_sample on
# non-AVI payloads raises).
# ---------------------------------------------------------------------------

VIDEO_FRAMES = 4
VIDEO_FPS = 10
MJPEG_QUALITY = 90


def mjpeg_expectation_table(quality: int = MJPEG_QUALITY) -> list:
    """(v, sum_r, sum_g, sum_b) for one decoded MJPEG frame of each of
    the 256 flat sources, computed by the engine's own JPEG
    encode→decode round trip. The DuckDB oracle carries it as a VALUES
    table: a driver hash match then proves executor-side AVI/MJPEG
    decode is deterministic and identical to this reference
    evaluation."""
    from ..functions.jpeg import decode_jpeg, encode_jpeg

    rows = []
    for v in range(256):
        dec = decode_jpeg(encode_jpeg(lossy_flat_image(v), quality))
        if dec.ndim == 2:
            dec = np.stack([dec] * 3, -1)
        s = dec[..., :3].astype(np.int64).sum(axis=(0, 1))
        rows.append((v, int(s[0]), int(s[1]), int(s[2])))
    return rows


def attach_real_video(df: DataFrame) -> DataFrame:
    """doc_id → actual AVI container bytes in the ``media`` column:
    even doc_ids carry VIDEO_FRAMES uncompressed BI_RGB DIB frames of
    the closed-form synth_image generator (lossless — the SQL oracle
    recomputes the sums directly); odd doc_ids carry VIDEO_FRAMES MJPEG
    frames of the flat sources keyed by (doc_id + frame) % 256, so
    their decode is covered by mjpeg_expectation_table()."""
    from ..functions.avi import encode_avi_dib, encode_avi_mjpeg

    def gen(batches):
        mj_cache: dict[int, bytes] = {}
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    payload = encode_avi_dib(
                        [synth_image(d + f) for f in range(VIDEO_FRAMES)],
                        fps=VIDEO_FPS,
                    )
                else:
                    v = d % 256
                    if v not in mj_cache:
                        mj_cache[v] = encode_avi_mjpeg(
                            [
                                lossy_flat_image((v + f) % 256)
                                for f in range(VIDEO_FRAMES)
                            ],
                            fps=VIDEO_FPS,
                            quality=MJPEG_QUALITY,
                        )
                    payload = mj_cache[v]
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    return df.mapInPandas(gen, schema="doc_id bigint, media binary")


def decode_video_features(df: DataFrame) -> DataFrame:
    """media binary (AVI) → REAL container+codec decode → per-doc
    (codec, width, height, n_frames, fps×100, per-channel integer pixel
    sums over ALL frames). Exact bigints: order-free, lossless-exact on
    the DIB leg and expectation-table-exact on the MJPEG leg."""
    from ..functions.avi import decode_avi, probe_avi

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(payload)
                meta = probe_avi(raw)
                frames, fps = decode_avi(raw)
                arr = np.stack(frames).astype(np.int64)
                s = arr[..., :3].sum(axis=(0, 1, 2))
                rows.append(
                    (int(doc_id), meta["codec"], arr.shape[2], arr.shape[1],
                     len(frames), int(round(fps * 100)),
                     int(s[0]), int(s[1]), int(s[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "codec", "width", "height", "n_frames",
                         "fps_x100", "sum_r", "sum_g", "sum_b"],
            )

    return df.mapInPandas(
        gen,
        schema="doc_id bigint, codec string, width int, height int, "
        "n_frames int, fps_x100 int, sum_r bigint, sum_g bigint, "
        "sum_b bigint",
    )


# ---------------------------------------------------------------------------
# Container-metadata probe (r6): filter media by resolution / duration /
# codec BEFORE any decode. At 100 TB the probe pass is scan-bound
# (header reads only — functions/mediainfo.py), so the expensive decode
# stage runs on survivors, not the whole crawl.
# ---------------------------------------------------------------------------

def attach_mixed_media(df: DataFrame) -> DataFrame:
    """doc_id → deterministic container-twin payloads cycling by
    doc_id%4: AVI (real frames) / MP4 stub / WebM stub / MP3 frame
    stream — the shape of an unfiltered crawl media column."""
    from ..functions.avi import encode_avi_dib
    from ..functions.mediainfo import build_mp3, mux_mkv, mux_mp4

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = d % 4
                if m == 0:
                    payload = encode_avi_dib(
                        [synth_image(d)] * 2, fps=VIDEO_FPS
                    )
                elif m == 1:
                    payload = mux_mp4(
                        [{"kind": "video", "codec": "avc1",
                          "width": 320 + d % 1600, "height": 240 + d % 900},
                         {"kind": "audio", "codec": "mp4a",
                          "sample_rate": 48000, "channels": 2}],
                        duration_ms=1000 + d % 60000,
                    )
                elif m == 2:
                    payload = mux_mkv(
                        [{"kind": "video", "codec": "V_VP9",
                          "width": 426 + d % 1280, "height": 240 + d % 720}],
                        duration_ms=500 + d % 30000, webm=True,
                    )
                else:
                    payload = build_mp3(
                        n_frames=4 + d % 16, kbps=128, rate=44100,
                        mono=bool(d % 8 == 3), id3_bytes=d % 64,
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    return df.mapInPandas(gen, schema="doc_id bigint, media binary")


def probe_media_features(df: DataFrame) -> DataFrame:
    """media binary → header-only container probe → one row per doc
    with first-video-track geometry and first-audio-track layout.
    No decode happens: this is the cheap pre-filter stage."""
    from ..functions.mediainfo import probe_media

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                meta = probe_media(bytes(payload))
                tracks = meta.get("tracks", [])
                vid = next(
                    (t for t in tracks if t.get("kind") == "video"), {}
                )
                aud = next(
                    (t for t in tracks if t.get("kind") == "audio"), {}
                )
                if meta["container"] == "mp3":
                    aud = meta
                    codec = "mp3"
                else:
                    codec = vid.get("codec") or aud.get("codec")
                rows.append((
                    int(doc_id), meta["container"], codec,
                    vid.get("width"), vid.get("height"),
                    aud.get("sample_rate"), aud.get("channels"),
                    meta.get("duration_ms"), len(tracks) or 1,
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "container", "codec", "width", "height",
                         "sample_rate", "channels", "duration_ms",
                         "n_tracks"],
            )

    return df.mapInPandas(
        gen,
        schema="doc_id bigint, container string, codec string, "
        "width int, height int, sample_rate int, channels int, "
        "duration_ms bigint, n_tracks int",
    )


# codecs the engine can fully decode in-house (no ffmpeg); everything
# else is probe-only at crawl scale — metadata without decode. Lossy
# WebP ("webp_lossy") is deliberately probe_only: foreign VP8 streams
# cannot be decoded while the RFC 6386 default tables ship as
# placeholders (functions/vp8.py TABLES_ARE_PLACEHOLDERS).
DECODABLE_IMAGE_FMTS = frozenset(
    {"png", "jpg", "gif", "bmp", "ico", "tiff", "svg", "webp", "webp_x"}
)
DECODABLE_AVI_CODECS = frozenset({"mjpeg", "rawvideo", "msrle"})


def route_media_payload(payload: bytes) -> tuple:
    """One payload → (kind, container, codec, route) WITHOUT decoding:
    magic sniff + header-only probe. route is 'decode' (an in-house
    decoder exists), 'probe_only' (compressed codec: keep the metadata,
    never decode) or 'skip' (unrecognized). This is the pre-filter a
    100 TB crawl runs before ANY decoder (r7, VERDICT r6 item 8)."""
    from ..functions.mediainfo import probe_media

    try:
        fmt = sniff_format(payload)
        route = "decode" if fmt in DECODABLE_IMAGE_FMTS else "probe_only"
        return ("image", fmt, fmt, route)
    except ValueError:
        pass
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return ("audio", "wav", "pcm", "decode")
    if payload[:4] == b"fLaC":
        return ("audio", "flac", "flac", "decode")
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        return ("audio", "aiff", "pcm", "decode")
    try:
        meta = probe_media(payload)
    except ValueError:
        return ("unknown", None, None, "skip")
    tracks = meta.get("tracks", [])
    vid = next((t for t in tracks if t.get("kind") == "video"), None)
    aud = next((t for t in tracks if t.get("kind") == "audio"), None)
    container = meta["container"]
    if container == "mp3":
        return ("audio", "mp3", "mp3", "probe_only")
    codec = (vid or aud or {}).get("codec")
    kind = "video" if vid else "audio"
    decodable = (
        container in ("avi", "mp4") and vid is not None
        and codec in DECODABLE_AVI_CODECS
    )
    return (kind, container, codec, "decode" if decodable else "probe_only")


def route_media_records(df: DataFrame, payload_col: str = "body",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, payload) records → routing table (doc_id, kind, container,
    codec, route). Arrow-batched header-only pass — bytes touched per
    payload are O(header), so the stage is scan-bound at crawl scale."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                kind, container, codec, route = route_media_payload(
                    bytes(payload)
                )
                rows.append((int(doc_id), kind, container, codec, route))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "container", "codec", "route"],
            )

    return df.mapInPandas(
        gen,
        schema="doc_id bigint, kind string, container string, "
        "codec string, route string",
    )


def image_gps(df: DataFrame, payload_col: str = "media",
              id_col: str = "doc_id") -> DataFrame:
    """(id, jpeg binary) → (id, lat, lon) from the EXIF GPS IFD — the
    geospatial handle on a crawled image corpus. Header-only parse (no
    pixel decode) in an Arrow-batched stage; rows without a GPS IFD
    (or non-JPEG payloads) are dropped. The output feeds pip_join /
    zonal_statistics directly: crawl images → regions."""
    def gen(batches):
        from ..functions.jpeg import exif_gps

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if raw[:2] != b"\xff\xd8":
                    continue
                gps = exif_gps(raw)
                if gps is not None:
                    rows.append((int(did), float(gps[0]), float(gps[1])))
            yield pd.DataFrame(rows, columns=[id_col, "lat", "lon"])

    return df.mapInPandas(
        gen, schema=f"{id_col} bigint, lat double, lon double"
    )
