"""AIFF codec (r6): twin round trips at all widths, exact 80-bit
extended sample-rate handling, foreign chunk layouts, AIFC rejection."""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.aiff import (
    _f80_decode,
    _f80_encode,
    decode_aiff,
    encode_aiff,
)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_roundtrip_widths(bits):
    rng = np.random.default_rng(bits)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    wave = rng.integers(lo, hi + 1, size=(300, 2)).astype(np.int64)
    out, rate = decode_aiff(encode_aiff(wave, 44100, bits=bits))
    assert rate == 44100
    assert out.shape == (300, 2)
    assert np.array_equal(out, wave)


def test_f80_exact_rates():
    for rate in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 192000):
        assert _f80_decode(_f80_encode(rate)) == rate
    # negative / out-of-range rejected
    with pytest.raises(ValueError):
        _f80_decode(struct.pack(">HQ", 0x8000 | 16383, 1 << 63))


def test_mono_1d_input():
    wave = np.arange(-50, 50, dtype=np.int16)
    out, rate = decode_aiff(encode_aiff(wave, 8000))
    assert out.shape == (100, 1)
    assert np.array_equal(out[:, 0], wave)


def test_foreign_layout_and_errors():
    # chunk order SSND-before-COMM plus a junk chunk: still decodes
    wave = np.arange(10, dtype=np.int16)
    data = encode_aiff(wave, 16000)
    # split into chunks and reorder
    form = data[12:]
    chunks = []
    pos = 0
    while pos + 8 <= len(form):
        (size,) = struct.unpack(">I", form[pos + 4 : pos + 8])
        size += size & 1
        chunks.append(form[pos : pos + 8 + size])
        pos += 8 + size
    reordered = (chunks[1] + b"JUNK\x00\x00\x00\x02zz" + chunks[0])
    out = b"FORM" + struct.pack(">I", len(reordered) + 4) + b"AIFF" + reordered
    got, rate = decode_aiff(out)
    assert np.array_equal(got[:, 0], wave)
    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(b"RIFF\x00\x00\x00\x04WAVE")
    with pytest.raises(NotImplementedError, match="AIFC"):
        decode_aiff(b"FORM\x00\x00\x00\x04AIFC")
    with pytest.raises(ValueError, match="overruns"):
        truncated = bytearray(encode_aiff(wave, 16000))
        decode_aiff(bytes(truncated[:-8]))
    # SSND present but holding fewer frames than COMM declares
    short = bytearray(encode_aiff(wave, 16000))
    i = short.find(b"SSND")
    declared = struct.unpack(">I", short[i + 4 : i + 8])[0]
    struct.pack_into(">I", short, i + 4, declared - 4)  # drop 2 frames
    with pytest.raises(ValueError, match="shorter than"):
        decode_aiff(bytes(short[:-4]))


def test_audio_decode_dispatch(spark):
    from trefoil_spark.operators.multimodal import (
        attach_real_audio,
        decode_audio_features,
        synth_audio,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)], "doc_id bigint")
    rows = {
        r["doc_id"]: r
        for r in decode_audio_features(attach_real_audio(docs)).collect()
    }
    for d, r in rows.items():
        want_fmt = {0: "wav", 1: "flac", 2: "wav", 3: "aiff"}[d % 4]
        assert r["fmt"] == want_fmt
        s = synth_audio(d).astype(np.int64)
        assert r["sum_amp"] == int(s.sum())
        assert r["n_samples"] == len(s)
        assert r["sample_rate"] == 16000
