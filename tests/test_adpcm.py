"""ADPCM WAV decode (MS format 2, IMA format 0x11) + IMA encoder twin.

Fixture discipline: the foreign-block tests hand-build blocks and compute
the expected samples with an INDEPENDENT reference recursion written here
in the test (own copy of the format-normative tables), so the decoder is
never checked against its own output. Reference behaviors: the block
layouts and quantizer recursions are the published IMA Digital Audio Pack
and Microsoft WAVE-spec algorithms (public, format-normative)."""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.wav import (
    decode_wav,
    encode_wav_ima_adpcm,
)

# Independent copies of the format-normative tables (IMA DAP / MS WAVE
# spec) for the test-side reference recursions.
IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_IDX = [-1, -1, -1, -1, 2, 4, 6, 8]
MS_COEF = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
           (460, -208), (392, -232)]
MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230]


def ref_ima(pred, idx, nibbles):
    """Independent IMA recursion (multiply form: diff = ((2n+1)*step)>>3
    is NOT used — the spec's shift-add form is, but written via a
    different loop shape than the module's)."""
    out = []
    for n in nibbles:
        step = IMA_STEPS[idx]
        mag = n & 7
        diff = step >> 3
        for bit, shift in ((4, 0), (2, 1), (1, 2)):
            if mag & bit:
                diff += step >> shift
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_IDX[mag]))
        out.append(pred)
    return out, idx


def wav_container(fmt_body, data):
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ima_wav(ch, rate, block_align, spb, data):
    fmt = struct.pack("<HHIIHHHH", 0x11, ch, rate,
                      rate * block_align // spb, block_align, 4, 2, spb)
    return wav_container(fmt, data)


def test_ima_foreign_block_mono():
    """Hand-built mono IMA block decodes to the independent recursion's
    output; header predictor is emitted as the first sample."""
    nib_bytes = bytes([0x31, 0x8F, 0x40, 0xA2, 0x07, 0x7C, 0xE5, 0x19])
    nibbles = []
    for b in nib_bytes:
        nibbles += [b & 0xF, b >> 4]  # low nibble first per spec
    block = struct.pack("<hBB", -1234, 24, 0) + nib_bytes
    expected, _ = ref_ima(-1234, 24, nibbles)
    arr, rate = decode_wav(ima_wav(1, 8000, len(block), 17, block))
    assert rate == 8000
    assert arr.shape == (17, 1)
    assert arr[0, 0] == -1234
    assert arr[1:, 0].tolist() == expected


def test_ima_foreign_block_stereo_interleave():
    """Stereo: 4-byte nibble groups alternate L,R; state is per-channel."""
    left = bytes([0x11, 0x22, 0x33, 0x44])
    right = bytes([0xF8, 0x07, 0xA5, 0x5A])
    block = (
        struct.pack("<hBB", 100, 0, 0)
        + struct.pack("<hBB", -100, 40, 0)
        + left + right
    )
    def nibs(bs):
        out = []
        for b in bs:
            out += [b & 0xF, b >> 4]
        return out
    exp_l, _ = ref_ima(100, 0, nibs(left))
    exp_r, _ = ref_ima(-100, 40, nibs(right))
    arr, _ = decode_wav(ima_wav(2, 16000, len(block), 9, block))
    assert arr.shape == (9, 2)
    assert arr[0].tolist() == [100, -100]
    assert arr[1:, 0].tolist() == exp_l
    assert arr[1:, 1].tolist() == exp_r


def test_ima_multiblock_state_resets():
    """Each block's header re-seeds predictor+index (per spec — blocks
    are independently decodable seek points)."""
    b1 = struct.pack("<hBB", 0, 0, 0) + bytes([0x77, 0x77, 0x77, 0x77])
    b2 = struct.pack("<hBB", 9999, 60, 0) + bytes([0x00, 0x00, 0x00, 0x00])
    arr, _ = decode_wav(ima_wav(1, 8000, len(b1), 9, b1 + b2))
    assert arr.shape == (18, 1)
    assert arr[9, 0] == 9999  # block 2 header sample, not carried state


def ref_ms_block(pidx, idelta, s1, s2, nibbles):
    c1, c2 = MS_COEF[pidx]
    hist = [s2, s1]
    for n in nibbles:
        pred = (hist[-1] * c1 + hist[-2] * c2) >> 8
        signed = n - 16 if n & 8 else n
        samp = max(-32768, min(32767, pred + idelta * signed))
        hist.append(samp)
        idelta = max(16, (MS_ADAPT[n] * idelta) >> 8)
    return hist


def test_ms_adpcm_foreign_block_mono():
    nib_bytes = bytes([0x12, 0xF3, 0x8A, 0x05])
    nibbles = []
    for b in nib_bytes:
        nibbles += [b >> 4, b & 0xF]  # MS is high nibble first
    block = (
        bytes([1])                       # predictor index 1 → (512, -256)
        + struct.pack("<h", 64)          # idelta
        + struct.pack("<h", 500)         # sample1 (the LATER sample)
        + struct.pack("<h", -300)        # sample2 (emitted first)
        + nib_bytes
    )
    expected = ref_ms_block(1, 64, 500, -300, nibbles)
    fmt = struct.pack("<HHIIHHHH", 2, 1, 22050, 11025, len(block), 4, 2,
                      2 + len(nibbles))
    arr, rate = decode_wav(wav_container(fmt, block))
    assert rate == 22050
    assert arr[:, 0].tolist() == expected


def test_ms_adpcm_foreign_block_stereo():
    """Stereo MS ADPCM: full per-channel headers, then nibbles alternate
    channels starting with channel 0."""
    nib_bytes = bytes([0x4B, 0xC2])
    block = (
        bytes([0, 4])                                   # predictor idx L, R
        + struct.pack("<hh", 32, 48)                    # idelta L, R
        + struct.pack("<hh", 1000, -2000)               # sample1 L, R
        + struct.pack("<hh", 800, -1500)                # sample2 L, R
        + nib_bytes
    )
    nibbles = []
    for b in nib_bytes:
        nibbles += [b >> 4, b & 0xF]
    exp_l = ref_ms_block(0, 32, 1000, 800, nibbles[0::2])
    exp_r = ref_ms_block(4, 48, -2000, -1500, nibbles[1::2])
    fmt = struct.pack("<HHIIHHHH", 2, 2, 8000, 8000, len(block), 4, 2, 4)
    arr, _ = decode_wav(wav_container(fmt, block))
    assert arr[:, 0].tolist() == exp_l
    assert arr[:, 1].tolist() == exp_r


def test_ima_encoder_twin_roundtrip_mono():
    t = np.arange(2000)
    sig = (12000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    wav = encode_wav_ima_adpcm(sig, 16000)
    arr, rate = decode_wav(wav)
    assert rate == 16000
    dec = arr[: len(sig), 0].astype(np.float64)
    err = dec - sig.astype(np.float64)
    snr = 10 * np.log10(np.mean(sig.astype(np.float64) ** 2)
                        / max(np.mean(err ** 2), 1e-9))
    assert snr > 20.0  # 4-bit ADPCM on a smooth tone is well above this
    assert arr[0, 0] == sig[0]


def test_ima_encoder_twin_roundtrip_stereo():
    t = np.arange(1500)
    sig = np.stack(
        [
            (9000 * np.sin(2 * np.pi * 300 * t / 8000)).astype(np.int16),
            (7000 * np.sin(2 * np.pi * 520 * t / 8000 + 1.0)).astype(np.int16),
        ],
        axis=-1,
    )
    arr, rate = decode_wav(encode_wav_ima_adpcm(sig, 8000))
    assert rate == 8000
    dec = arr[: len(sig)].astype(np.float64)
    err = dec - sig.astype(np.float64)
    snr = 10 * np.log10(np.mean(sig.astype(np.float64) ** 2)
                        / max(np.mean(err ** 2), 1e-9))
    assert snr > 20.0


def test_ima_encoder_decode_is_exact_inverse_of_quantized_path():
    """decode(encode(x)) equals the encoder's own reconstruction — i.e.
    the lossy step happens exactly once, at quantization. Verified by
    re-running the independent reference recursion over the emitted
    nibbles."""
    rng = np.random.default_rng(7)
    sig = rng.integers(-20000, 20000, 300).astype(np.int16)
    wav = encode_wav_ima_adpcm(sig, 8000)
    arr, _ = decode_wav(wav)
    # parse the data chunk back out and re-decode with the reference
    pos = 12
    block_align = spb = None
    data = None
    while pos + 8 <= len(wav):
        tag = wav[pos : pos + 4]
        (size,) = struct.unpack("<I", wav[pos + 4 : pos + 8])
        body = wav[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            block_align = struct.unpack("<H", body[12:14])[0]
            spb = struct.unpack("<H", body[18:20])[0]
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
    ref_out = []
    for b0 in range(0, len(data), block_align):
        blk = data[b0 : b0 + block_align]
        pred, idx, _ = struct.unpack_from("<hBB", blk, 0)
        nibbles = []
        for byte in blk[4:]:
            nibbles += [byte & 0xF, byte >> 4]
        dec, _ = ref_ima(pred, idx, nibbles)
        ref_out += [pred] + dec
    assert arr[:, 0].tolist() == ref_out[: arr.shape[0]]


def test_adpcm_malformed():
    bad_idx = struct.pack("<hBB", 0, 89, 0) + bytes(4)
    with pytest.raises(ValueError, match="step index"):
        decode_wav(ima_wav(1, 8000, len(bad_idx), 9, bad_idx))
    bad_pred = bytes([7]) + struct.pack("<hhh", 16, 0, 0) + bytes(2)
    fmt = struct.pack("<HHIIHHHH", 2, 1, 8000, 8000, len(bad_pred), 4, 2, 6)
    with pytest.raises(ValueError, match="predictor index"):
        decode_wav(wav_container(fmt, bad_pred))
