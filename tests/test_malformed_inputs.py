"""Malformed-input regression tests for the r6 ADVICE fixes.

Each case feeds a deliberately corrupt stream to a decoder and asserts
the documented clean-error contract (ValueError, never IndexError or
silently wrong output)."""
import struct
import zlib

import numpy as np
import pytest

from trefoil_spark.functions.jpeg import decode_jpeg, encode_jpeg
from trefoil_spark.functions.png import _chunk, decode_png
from trefoil_spark.functions.wav import decode_wav, encode_wav


class TestJpegTruncation:
    def test_truncated_entropy_stream_raises_valueerror(self):
        img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
        full = encode_jpeg(img, 90)
        # cut deep inside the entropy-coded segment, keep headers intact
        sos = full.find(b"\xff\xda")
        cut = full[: sos + (len(full) - sos) // 2]
        with pytest.raises(ValueError):
            decode_jpeg(cut)

    def test_header_cut_raises_valueerror(self):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        full = encode_jpeg(img, 90)
        # cut inside the marker segments (before SOS): struct underflow path
        with pytest.raises(ValueError):
            decode_jpeg(full[:20])


class TestPngIllegalDepth:
    def _png(self, depth: int, ctype: int) -> bytes:
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, 0)
        # one filter byte + data per row; content irrelevant (rejected first)
        raw = zlib.compress(bytes(4 * (1 + 4)))
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", raw)
            + _chunk(b"IEND", b"")
        )

    @pytest.mark.parametrize("depth", [3, 5, 6, 7, 12])
    def test_illegal_grayscale_depth_rejected(self, depth):
        with pytest.raises(ValueError, match="depth"):
            decode_png(self._png(depth, 0))

    def test_illegal_palette_depth_rejected(self):
        with pytest.raises(ValueError, match="depth"):
            decode_png(self._png(3, 3))


class TestWavTruncation:
    def test_data_chunk_overrun_raises(self):
        sig = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
        full = bytearray(encode_wav(sig, 8000))
        # locate data chunk and inflate its declared size past EOF
        pos = full.find(b"data")
        size = struct.unpack("<I", full[pos + 4 : pos + 8])[0]
        struct.pack_into("<I", full, pos + 4, size + 1000)
        with pytest.raises(ValueError, match="data chunk"):
            decode_wav(bytes(full))

    def test_intact_file_still_decodes(self):
        sig = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
        out, sr = decode_wav(encode_wav(sig, 8000))
        assert sr == 8000
        np.testing.assert_array_equal(np.asarray(out).ravel(), sig)
