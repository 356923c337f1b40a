"""Container-metadata probes: MP4 / ISO-BMFF, Matroska / WebM (EBML),
MP3 (MPEG audio frame headers + ID3v2), plus AVI via functions/avi.py.

At crawl scale the expensive mistake is DECODING media you were going
to drop: a pipeline filters by resolution / duration / codec first, and
only the survivors hit a decoder. These probes read container headers
only (no codec work, no full-file scan beyond the frame walk for MP3),
so a `probe_media` pass over 100 TB of payloads is scan-bound, not
compute-bound.

All layouts are public: ISO/IEC 14496-12 box structure (ftyp/moov/
mvhd/trak/tkhd/mdia/mdhdr/hdlr/stsd), the Matroska/EBML element IDs
from RFC 8794 + the public Matroska spec, and the MPEG-1/2 audio frame
header tables (ISO 11172-3 / 13818-3). Decode of the streams inside
(H.264, VP9, Vorbis, MP3 audio...) stays honestly out of scope —
`NotImplementedError` names the codec.

Encoder twins (`mux_mp4`, `mux_mkv`, `build_mp3`) exist so tests can
build foreign-layout fixtures without shipping binary blobs; they emit
spec-layout containers with stub media data.

Reference context: the reference delegates all media IO to PIL and has
no container probe at all (trefoil/cli/utilities.py:16-34); this is a
beyond-reference capability for the LLM-pipeline suite.
"""

from __future__ import annotations

import struct

__all__ = [
    "probe_media", "probe_mp4", "probe_mkv", "probe_mp3", "probe_ogg",
    "mux_mp4", "mux_mkv", "build_mp3", "mux_ogg",
]


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF
# ---------------------------------------------------------------------------

def _boxes(data: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end); handles 64-bit largesize."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns container")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data, pos, end, btype):
    for t, p, e in _boxes(data, pos, end):
        if t == btype:
            return p, e
    return None


def probe_mp4(data: bytes) -> dict:
    """ISO-BMFF bytes → container metadata (header-only):
    {"container": "mp4", "brand", "duration_ms", "tracks": [
      {"kind": "video"|"audio"|fourcc, "codec", "width", "height",
       "sample_rate", "channels", "duration_ms"}]}"""
    top = list(_boxes(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no leading ftyp)")
    brand = data[top[0][1] : top[0][1] + 4].decode("latin-1")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box (streaming-only fragment?)")
    out = {"container": "mp4", "brand": brand, "duration_ms": None,
           "tracks": []}
    mvhd = _find(data, *moov, b"mvhd")
    if mvhd is not None:
        p, _e = mvhd
        ver = data[p]
        if ver == 1:
            ts, dur = struct.unpack(">IQ", data[p + 20 : p + 32])
        else:
            ts, dur = struct.unpack(">II", data[p + 12 : p + 20])
        if ts:
            out["duration_ms"] = int(dur * 1000 // ts)
    for t, p, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        track: dict = {"kind": None, "codec": None, "width": None,
                       "height": None, "sample_rate": None,
                       "channels": None, "duration_ms": None}
        tkhd = _find(data, p, e, b"tkhd")
        if tkhd is not None:
            tp, _te = tkhd
            ver = data[tp]
            # v0: ver/flags 4 + ctime/mtime/id/reserved/duration 5×4;
            # v1: ctime/mtime/duration widen to 8 bytes
            base = tp + (24 if ver == 0 else 36)
            # ...reserved(8) layer(2) altgroup(2) volume(2) reserved(2)
            # matrix(36) then width/height as 16.16 fixed
            wh = base + 16 + 36
            w16, h16 = struct.unpack(">II", data[wh : wh + 8])
            if w16 or h16:
                track["width"], track["height"] = w16 >> 16, h16 >> 16
        mdia = _find(data, p, e, b"mdia")
        if mdia is not None:
            mdhd = _find(data, *mdia, b"mdhd")
            if mdhd is not None:
                mp, _me = mdhd
                ver = data[mp]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", data[mp + 20 : mp + 32])
                else:
                    ts, dur = struct.unpack(">II", data[mp + 12 : mp + 20])
                if ts:
                    track["duration_ms"] = int(dur * 1000 // ts)
                    if track["sample_rate"] is None:
                        track["_mdhd_ts"] = ts
            hdlr = _find(data, *mdia, b"hdlr")
            if hdlr is not None:
                hp, _he = hdlr
                kind = data[hp + 8 : hp + 12]
                track["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                    kind, kind.decode("latin-1")
                )
            minf = _find(data, *mdia, b"minf")
            stbl = _find(data, *minf, b"stbl") if minf else None
            stsd = _find(data, *stbl, b"stsd") if stbl else None
            if stsd is not None:
                sp, se = stsd
                for st, sp2, _se2 in _boxes(data, sp + 8, se):
                    track["codec"] = st.decode("latin-1").strip()
                    if track["kind"] == "audio":
                        # SampleEntry(8) + ver/rev/vendor(8) +
                        # channels(2) bits(2) pre(2) pack(2) rate 16.16
                        track["channels"] = struct.unpack(
                            ">H", data[sp2 + 16 : sp2 + 18]
                        )[0]
                        track["sample_rate"] = struct.unpack(
                            ">I", data[sp2 + 24 : sp2 + 28]
                        )[0] >> 16
                    break
        track.pop("_mdhd_ts", None)
        out["tracks"].append(track)
    return out


def mux_mp4(tracks: list, duration_ms: int = 0, brand: str = "isom") -> bytes:
    """Spec-layout MP4 twin with stub media: each track is a dict with
    kind ('video'/'audio'), codec fourcc, and width/height or
    sample_rate/channels. Emits ftyp + moov(mvhd + trak per entry) +
    empty mdat."""
    def box(t: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + t + payload

    ts = 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(
            ">IIII", 0, 0, ts, duration_ms
        ) + struct.pack(">IHHII", 0x00010000, 0x0100, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1),
    )
    traks = b""
    for i, tr in enumerate(tracks):
        w = tr.get("width") or 0
        h = tr.get("height") or 0
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07" + struct.pack(
                ">IIII", 0, 0, i + 1, 0
            ) + struct.pack(">I", duration_ms) + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0x0100 if tr["kind"] == "audio" else 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = box(
            b"mdhd",
            b"\x00\x00\x00\x00" + struct.pack(
                ">IIII", 0, 0, tr.get("sample_rate") or ts,
                (tr.get("sample_rate") or ts) * duration_ms // 1000,
            ) + struct.pack(">HH", 0x55C4, 0),
        )
        hk = b"vide" if tr["kind"] == "video" else b"soun"
        hdlr = box(b"hdlr", b"\x00" * 8 + hk + b"\x00" * 12 + b"stub\x00")
        fourcc = tr["codec"].ljust(4)[:4].encode("latin-1")
        if tr["kind"] == "audio":
            entry = box(
                fourcc,
                b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
                + struct.pack(">HHHH", tr.get("channels") or 2, 16, 0, 0)
                + struct.pack(">I", (tr.get("sample_rate") or 44100) << 16),
            )
        else:
            entry = box(
                fourcc,
                b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                + struct.pack(">HH", w, h) + b"\x00" * 50,
            )
        stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0x200)
               + b"isommp41")
    return ftyp + moov + box(b"mdat", b"")


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML, RFC 8794)
# ---------------------------------------------------------------------------

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-size integer at pos → (value, next_pos)."""
    first = data[pos]
    if first == 0:
        raise ValueError("EBML: invalid vint (>8 bytes)")
    length = 8 - first.bit_length() + 1
    val = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def _ebml_elements(data: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end)."""
    while pos < end:
        eid, pos = _vint(data, pos, keep_marker=True)
        size, pos = _vint(data, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError(f"EBML element {eid:#x} overruns container")
        yield eid, pos, pos + size
        pos += size


def _uint(data: bytes, p: int, e: int) -> int:
    v = 0
    for b in data[p:e]:
        v = (v << 8) | b
    return v


def probe_mkv(data: bytes) -> dict:
    """Matroska/WebM bytes → container metadata (header-only):
    {"container": "mkv"|"webm", "duration_ms", "tracks": [
      {"kind", "codec", "width", "height", "sample_rate", "channels"}]}"""
    if data[:4] != _EBML_MAGIC:
        raise ValueError("not an EBML/Matroska file")
    doctype = "matroska"
    segment = None
    for eid, p, e in _ebml_elements(data, 0, len(data)):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, hp, he in _ebml_elements(data, p, e):
                if hid == 0x4282:  # DocType
                    doctype = data[hp:he].decode("latin-1")
        elif eid == 0x18538067:  # Segment
            segment = (p, e)
            break
    if segment is None:
        raise ValueError("Matroska file has no Segment")
    out = {"container": "webm" if doctype == "webm" else "mkv",
           "duration_ms": None, "tracks": []}
    ts_scale = 1_000_000  # ns per tick, Matroska default
    duration_ticks = None
    for eid, p, e in _ebml_elements(data, *segment):
        if eid == 0x1549A966:  # Info
            for iid, ip, ie in _ebml_elements(data, p, e):
                if iid == 0x2AD7B1:  # TimestampScale
                    ts_scale = _uint(data, ip, ie)
                elif iid == 0x4489:  # Duration (float)
                    raw = data[ip:ie]
                    duration_ticks = struct.unpack(
                        ">f" if len(raw) == 4 else ">d", raw
                    )[0]
        elif eid == 0x1654AE6B:  # Tracks
            for tid, tp, te in _ebml_elements(data, p, e):
                if tid != 0xAE:  # TrackEntry
                    continue
                track = {"kind": None, "codec": None, "width": None,
                         "height": None, "sample_rate": None,
                         "channels": None}
                for fid, fp, fe in _ebml_elements(data, tp, te):
                    if fid == 0x83:  # TrackType
                        track["kind"] = {1: "video", 2: "audio"}.get(
                            _uint(data, fp, fe), "other"
                        )
                    elif fid == 0x86:  # CodecID
                        track["codec"] = data[fp:fe].rstrip(b"\x00").decode(
                            "latin-1"
                        )
                    elif fid == 0xE0:  # Video
                        for vid, vp, ve in _ebml_elements(data, fp, fe):
                            if vid == 0xB0:
                                track["width"] = _uint(data, vp, ve)
                            elif vid == 0xBA:
                                track["height"] = _uint(data, vp, ve)
                    elif fid == 0xE1:  # Audio
                        for aid, ap, ae in _ebml_elements(data, fp, fe):
                            if aid == 0xB5:
                                raw = data[ap:ae]
                                track["sample_rate"] = int(
                                    struct.unpack(
                                        ">f" if len(raw) == 4 else ">d", raw
                                    )[0]
                                )
                            elif aid == 0x9F:
                                track["channels"] = _uint(data, ap, ae)
                out["tracks"].append(track)
    if duration_ticks is not None:
        out["duration_ms"] = int(duration_ticks * ts_scale / 1_000_000)
    return out


def _ebml_el(eid_bytes: bytes, payload: bytes) -> bytes:
    n = len(payload)
    if n < 0x7F:
        size = bytes([0x80 | n])
    else:
        size = bytes([0x40 | (n >> 8), n & 0xFF])
    return eid_bytes + size + payload


def _ebml_uint(v: int) -> bytes:
    out = b"" if v else b"\x00"
    while v:
        out = bytes([v & 0xFF]) + out
        v >>= 8
    return out


def mux_mkv(tracks: list, duration_ms: int = 0,
            webm: bool = False) -> bytes:
    """Spec-layout Matroska/WebM twin with stub media (no Clusters)."""
    doctype = b"webm" if webm else b"matroska"
    header = _ebml_el(
        _EBML_MAGIC,
        _ebml_el(b"\x42\x86", b"\x01")       # EBMLVersion
        + _ebml_el(b"\x42\xf7", b"\x01")     # EBMLReadVersion
        + _ebml_el(b"\x42\x82", doctype)     # DocType
        + _ebml_el(b"\x42\x87", b"\x04")     # DocTypeVersion
        + _ebml_el(b"\x42\x85", b"\x02"),
    )
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        _ebml_el(b"\x2a\xd7\xb1", _ebml_uint(1_000_000))
        + _ebml_el(b"\x44\x89", struct.pack(">d", float(duration_ms))),
    )
    entries = b""
    for i, tr in enumerate(tracks):
        fields = (
            _ebml_el(b"\xd7", _ebml_uint(i + 1))        # TrackNumber
            + _ebml_el(b"\x73\xc5", _ebml_uint(i + 1))  # TrackUID
            + _ebml_el(
                b"\x83", _ebml_uint(1 if tr["kind"] == "video" else 2)
            )
            + _ebml_el(b"\x86", tr["codec"].encode("latin-1"))
        )
        if tr["kind"] == "video":
            fields += _ebml_el(
                b"\xe0",
                _ebml_el(b"\xb0", _ebml_uint(tr["width"]))
                + _ebml_el(b"\xba", _ebml_uint(tr["height"])),
            )
        else:
            fields += _ebml_el(
                b"\xe1",
                _ebml_el(
                    b"\xb5", struct.pack(">d", float(tr["sample_rate"]))
                )
                + _ebml_el(b"\x9f", _ebml_uint(tr.get("channels") or 2)),
            )
        entries += _ebml_el(b"\xae", fields)
    tracks_el = _ebml_el(b"\x16\x54\xae\x6b", entries)
    segment = _ebml_el(b"\x18\x53\x80\x67", info + tracks_el)
    return header + segment


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2 audio frame headers; ID3v2 skip)
# ---------------------------------------------------------------------------

_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                  224, 256, 320)
_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  144, 160)
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          0: (11025, 12000, 8000)}  # version bits → rates


_ID3_TEXT = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
             "TYER": "year", "TDRC": "year", "TCON": "genre"}


def _id3_tags(data: bytes, tag_end: int) -> dict:
    """ID3v2.3/2.4 text frames → {title/artist/album/year/genre}.
    v2.4 sizes are synchsafe, v2.3 plain big-endian; v2.2 (3-byte ids)
    is skipped rather than misparsed."""
    ver = data[3]
    tags: dict = {}
    if ver not in (3, 4):
        return tags
    pos = 10
    if data[5] & 0x40:  # extended header present: skip it
        (ehsz,) = struct.unpack(">I", data[10:14])
        pos += ehsz if ver == 3 else (
            (data[10] & 0x7F) << 21 | (data[11] & 0x7F) << 14
            | (data[12] & 0x7F) << 7 | (data[13] & 0x7F)
        )
    while pos + 10 <= tag_end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if ver == 4:
            size = ((data[pos + 4] & 0x7F) << 21
                    | (data[pos + 5] & 0x7F) << 14
                    | (data[pos + 6] & 0x7F) << 7
                    | (data[pos + 7] & 0x7F))
        else:
            (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 10 : pos + 10 + size]
        name = _ID3_TEXT.get(fid.decode("latin-1", "replace"))
        if name and body:
            enc, text = body[0], body[1:]
            try:
                if enc == 0:
                    val = text.decode("latin-1")
                elif enc == 1:
                    val = text.decode("utf-16")
                elif enc == 2:
                    val = text.decode("utf-16-be")
                else:
                    val = text.decode("utf-8")
                tags.setdefault(name, val.rstrip("\x00"))
            except UnicodeDecodeError:
                pass
        pos += 10 + size
    return tags


def probe_mp3(data: bytes) -> dict:
    """MP3 bytes → {"container": "mp3", "sample_rate", "channels",
    "bitrate_kbps" (first frame), "n_frames", "duration_ms", "tags"}
    via an ID3v2 text-frame parse + full frame-header walk (headers
    only, no decode; Layer III, MPEG-1 and MPEG-2/2.5)."""
    pos = 0
    tags: dict = {}
    if data[:3] == b"ID3":
        sz = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
              | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        tags = _id3_tags(data, 10 + sz)
        pos = 10 + sz
    n_frames = 0
    sample_rate = channels = bitrate0 = None
    total_samples = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing tag/garbage after the stream
            pos += 1
            continue
        b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
        ver = (b1 >> 3) & 0x03          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x03        # 1 = Layer III
        if ver == 1 or layer != 1:
            if n_frames:
                break
            pos += 1
            continue
        bridx = (b2 >> 4) & 0x0F
        sridx = (b2 >> 2) & 0x03
        if bridx in (0, 15) or sridx == 3:
            if n_frames:
                break
            pos += 1
            continue
        rate = _RATES[ver][sridx]
        kbps = (_BITRATES_V1L3 if ver == 3 else _BITRATES_V2L3)[bridx]
        pad = (b2 >> 1) & 1
        spf = 1152 if ver == 3 else 576  # samples per Layer-III frame
        frame_len = spf // 8 * kbps * 1000 // rate + pad
        if frame_len <= 4 or pos + frame_len > len(data):
            break
        if n_frames == 0:
            sample_rate = rate
            bitrate0 = kbps
            channels = 1 if (b3 >> 6) & 0x03 == 3 else 2
        n_frames += 1
        total_samples += spf
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {
        "container": "mp3", "sample_rate": sample_rate,
        "channels": channels, "bitrate_kbps": bitrate0,
        "n_frames": n_frames,
        "duration_ms": int(total_samples * 1000 // sample_rate),
        "tags": tags,
    }


def build_mp3(n_frames: int = 10, kbps: int = 128, rate: int = 44100,
              mono: bool = False, id3_bytes: int = 0,
              tags: dict | None = None) -> bytes:
    """MP3 twin: valid MPEG-1 Layer III frame headers with zero-fill
    payloads (probe-parseable, not decodable audio), optional ID3v2
    (v2.3 text frames from ``tags`` {title/artist/album/...} followed
    by ``id3_bytes`` of padding)."""
    bridx = _BITRATES_V1L3.index(kbps)
    sridx = _RATES[3].index(rate)
    out = bytearray()
    if id3_bytes or tags:
        frames_b = bytearray()
        rev = {v: k for k, v in _ID3_TEXT.items() if k != "TDRC"}
        for name, val in (tags or {}).items():
            body = b"\x03" + val.encode("utf-8")  # enc 3 = UTF-8
            frames_b += (rev[name].encode() + struct.pack(">I", len(body))
                         + b"\x00\x00" + body)
        sz = len(frames_b) + id3_bytes
        out += b"ID3\x03\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
             sz & 0x7F]
        ) + frames_b + b"\x00" * id3_bytes
    for _ in range(n_frames):
        frame_len = 144 * kbps * 1000 // rate
        hdr = bytes([
            0xFF, 0xFB,  # MPEG1 Layer III, no CRC
            (bridx << 4) | (sridx << 2),
            0xC0 if mono else 0x00,
        ])
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def probe_media(data: bytes) -> dict:
    """Magic-sniffed container probe: AVI / MP4 / Matroska-WebM / MP3.
    Returns a dict whose "container" key names the format; raises
    ValueError for unrecognized payloads."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from .avi import probe_avi

        meta = probe_avi(data)
        return {"container": "avi", "duration_ms": None,
                "tracks": [{"kind": "video", "codec": meta["codec"],
                            "width": meta["width"],
                            "height": meta["height"],
                            "sample_rate": None, "channels": None}],
                "fps": meta["fps"]}
    if data[4:8] == b"ftyp":
        return probe_mp4(data)
    if data[:4] == _EBML_MAGIC:
        return probe_mkv(data)
    if data[:4] == b"OggS":
        return probe_ogg(data)
    if data[:3] == b"ID3" or (
        len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return probe_mp3(data)
    raise ValueError("unknown media container")


# ---------------------------------------------------------------------------
# Ogg (RFC 3533 pages; Vorbis / Opus identification headers)
# ---------------------------------------------------------------------------

def probe_ogg(data: bytes) -> dict:
    """Ogg bytes → {"container": "ogg", "duration_ms", "tracks": [
    {"kind": "audio", "codec", "sample_rate", "channels"}]} from the
    BOS page of each logical stream; duration from the last page's
    granule position (Vorbis/Opus granules are PCM sample counts)."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    tracks: dict[int, dict] = {}
    last_granule: dict[int, int] = {}
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            break  # trailing garbage after the last page
        (granule,) = struct.unpack("<q", data[pos + 6 : pos + 14])
        (serial,) = struct.unpack("<I", data[pos + 14 : pos + 18])
        flags = data[pos + 5]
        nsegs = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + nsegs]
        body_start = pos + 27 + nsegs
        body_len = sum(seg_table)
        body = data[body_start : body_start + body_len]
        if flags & 0x02:  # BOS: identification header
            tr = {"kind": "audio", "codec": None, "sample_rate": None,
                  "channels": None}
            if body[:7] == b"\x01vorbis":
                tr["codec"] = "vorbis"
                tr["channels"] = body[11]
                (tr["sample_rate"],) = struct.unpack("<I", body[12:16])
            elif body[:8] == b"OpusHead":
                tr["codec"] = "opus"
                tr["channels"] = body[9]
                # granules always run at 48 kHz for Opus
                tr["sample_rate"] = 48000
            elif body[:7] == b"\x80theora":
                tr = {"kind": "video", "codec": "theora",
                      "sample_rate": None, "channels": None}
            else:
                tr["codec"] = body[:8].rstrip(b"\x00").decode(
                    "latin-1", "replace"
                )
            tracks[serial] = tr
        if granule >= 0:
            last_granule[serial] = granule
        pos = body_start + body_len
    if not tracks:
        raise ValueError("Ogg stream has no BOS page")
    duration_ms = None
    for serial, tr in tracks.items():
        rate = tr.get("sample_rate")
        if rate and serial in last_granule:
            ms = int(last_granule[serial] * 1000 // rate)
            duration_ms = max(duration_ms or 0, ms)
    return {"container": "ogg", "duration_ms": duration_ms,
            "tracks": list(tracks.values())}


def mux_ogg(codec: str = "vorbis", channels: int = 2, rate: int = 44100,
            n_samples: int = 0) -> bytes:
    """Ogg twin: a BOS page with a Vorbis/Opus ident header plus one
    EOS data page whose granule position encodes ``n_samples``."""
    def page(serial, seqno, body, flags, granule):
        segs = []
        rem = len(body)
        while rem >= 255:
            segs.append(255)
            rem -= 255
        segs.append(rem)
        hdr = (b"OggS\x00" + bytes([flags])
               + struct.pack("<qI", granule, serial)
               + struct.pack("<II", seqno, 0)
               + bytes([len(segs)]) + bytes(segs))
        return hdr + body

    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<IB", 0, channels)
                 + struct.pack("<IiiI", rate, 0, 0, 0) + b"\x01")
    elif codec == "opus":
        ident = (b"OpusHead\x01" + bytes([channels])
                 + struct.pack("<HIhB", 312, rate, 0, 0))
    else:
        raise ValueError("twin supports vorbis/opus")
    bos = page(1, 0, ident, 0x02, 0)
    eos = page(1, 1, b"\x00" * 10, 0x04, n_samples)
    return bos + eos


# ---------------------------------------------------------------------------
# MP4 video decode (r6): the sample-table walk. Photo-JPEG ('jpeg') and
# Motion-JPEG A ('mjpa') tracks hold one interchange-format JPEG per
# sample (QuickTime File Format spec), so with the sample tables
# resolved every frame decodes through the in-house T.81 decoder.
# Anything else (avc1/hev1/vp09...) raises naming the codec — real
# inter-frame video stays honestly ffmpeg-bound.
# ---------------------------------------------------------------------------

_MP4_JPEG_CODECS = (b"jpeg", b"mjpa")


def _stbl_tables(data: bytes, stbl: tuple) -> dict:
    """Parse the sample tables a sequential decode needs: stsd fourcc,
    stts (timing), stsc (sample→chunk), stsz (sizes), stco/co64
    (chunk offsets)."""
    t: dict = {}
    sp, se = stbl
    stsd = _find(data, sp, se, b"stsd")
    if stsd is None:
        raise ValueError("MP4 stbl has no stsd")
    for st, p2, _e2 in _boxes(data, stsd[0] + 8, stsd[1]):
        t["codec"] = st
        break
    stts = _find(data, sp, se, b"stts")
    if stts is not None:
        p, _ = stts
        (n,) = struct.unpack(">I", data[p + 4 : p + 8])
        t["stts"] = [
            struct.unpack(">II", data[p + 8 + 8 * i : p + 16 + 8 * i])
            for i in range(n)
        ]
    p, _ = _find(data, sp, se, b"stsz") or (None, None)
    if p is None:
        raise ValueError("MP4 stbl has no stsz")
    fixed, count = struct.unpack(">II", data[p + 4 : p + 12])
    t["sizes"] = (
        [fixed] * count
        if fixed
        else [
            struct.unpack(">I", data[p + 12 + 4 * i : p + 16 + 4 * i])[0]
            for i in range(count)
        ]
    )
    stco = _find(data, sp, se, b"stco")
    if stco is not None:
        p, _ = stco
        (n,) = struct.unpack(">I", data[p + 4 : p + 8])
        t["offsets"] = [
            struct.unpack(">I", data[p + 8 + 4 * i : p + 12 + 4 * i])[0]
            for i in range(n)
        ]
    else:
        co64 = _find(data, sp, se, b"co64")
        if co64 is None:
            raise ValueError("MP4 stbl has no stco/co64")
        p, _ = co64
        (n,) = struct.unpack(">I", data[p + 4 : p + 8])
        t["offsets"] = [
            struct.unpack(">Q", data[p + 8 + 8 * i : p + 16 + 8 * i])[0]
            for i in range(n)
        ]
    stsc = _find(data, sp, se, b"stsc")
    if stsc is None:
        raise ValueError("MP4 stbl has no stsc")
    p, _ = stsc
    (n,) = struct.unpack(">I", data[p + 4 : p + 8])
    t["stsc"] = [
        struct.unpack(">III", data[p + 8 + 12 * i : p + 20 + 12 * i])
        for i in range(n)
    ]
    return t


def _samples_per_chunk(stsc, n_chunks: int) -> list[int]:
    """Expand the run-length stsc table to one entry per chunk."""
    out = []
    for i, (first, per, _desc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        out.extend([per] * (last - first + 1))
    if len(out) != n_chunks:
        raise ValueError("MP4 stsc does not cover every chunk")
    return out


def decode_mp4_video(data: bytes):
    """MP4/QuickTime bytes → (list of (h, w, 3) uint8 RGB frames, fps)
    for the first video track. MJPEG flavors only (see module note)."""
    import numpy as np

    from .jpeg import decode_jpeg

    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    for t, p, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, p, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("MP4 video trak has no stbl")
        tables = _stbl_tables(data, stbl)
        if tables["codec"] not in _MP4_JPEG_CODECS:
            raise NotImplementedError(
                f"MP4 video codec {tables['codec'].decode('latin-1')!r} "
                "needs ffmpeg (only jpeg/mjpa here)"
            )
        mdhd = _find(data, *mdia, b"mdhd")
        fps = 0.0
        if mdhd is not None and tables.get("stts"):
            mp = mdhd[0]
            ver = data[mp]
            ts = struct.unpack(
                ">I", data[mp + (20 if ver == 1 else 12) :][:4]
            )[0]
            delta = tables["stts"][0][1]
            fps = ts / delta if delta else 0.0
        sizes = tables["sizes"]
        offsets = tables["offsets"]
        per_chunk = _samples_per_chunk(tables["stsc"], len(offsets))
        frames = []
        si = 0
        for ci, off in enumerate(offsets):
            pos = off
            for _ in range(per_chunk[ci]):
                if si >= len(sizes):
                    break
                raw = data[pos : pos + sizes[si]]
                img = decode_jpeg(raw)
                if img.ndim == 2:
                    img = np.stack([img] * 3, -1)
                frames.append(img)
                pos += sizes[si]
                si += 1
        if not frames:
            raise ValueError("MP4 video track has no samples")
        return frames, fps
    raise ValueError("MP4 has no video track")


def mux_mp4_mjpeg(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Twin writer: (h, w, 3) uint8 RGB frames → self-contained
    photo-JPEG MP4 (mdat before moov so stco offsets are absolute;
    full stts/stsc/stsz/stco sample tables; two chunks when there are
    4+ samples so the stsc expansion is exercised)."""
    import numpy as np

    from .jpeg import encode_jpeg

    def box(t: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + t + payload

    payloads = [encode_jpeg(np.asarray(f, np.uint8), quality)
                for f in frames]
    h, w = frames[0].shape[:2]
    n = len(payloads)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    # split samples into two chunks when possible
    c1 = n if n < 4 else (n + 1) // 2
    mdat_body = b"".join(payloads)
    mdat_off = len(ftyp) + 8
    off1 = mdat_off
    off2 = mdat_off + sum(len(p) for p in payloads[:c1])
    ts = int(fps)
    mvhd = box(b"mvhd", b"\x00" * 4 + struct.pack(
        ">IIII", 0, 0, ts, n) + b"\x00" * 80)
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(
        ">IIIII", 0, 0, 1, 0, n) + b"\x00" * 52
        + struct.pack(">II", w << 16, h << 16))
    mdhd = box(b"mdhd", b"\x00" * 4 + struct.pack(
        ">IIII", 0, 0, ts, n) + b"\x00" * 4)
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    entry = (b"\x00" * 6 + struct.pack(">H", 1)      # SampleEntry
             + b"\x00" * 16
             + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x480000, 0x480000)
             + b"\x00" * 4 + struct.pack(">H", 1)
             + b"\x00" * 32
             + struct.pack(">Hh", 24, -1))
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1)
               + box(b"jpeg", entry))
    stts = box(b"stts", b"\x00" * 4 + struct.pack(">III", 1, n, 1))
    if n < 4:
        stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 1)
                   + struct.pack(">III", 1, n, 1))
        stco = box(b"stco", b"\x00" * 4 + struct.pack(">II", 1, off1))
    else:
        stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 2)
                   + struct.pack(">III", 1, c1, 1)
                   + struct.pack(">III", 2, n - c1, 1))
        stco = box(b"stco", b"\x00" * 4 + struct.pack(">I", 2)
                   + struct.pack(">II", off1, off2))
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, n)
               + b"".join(struct.pack(">I", len(p)) for p in payloads))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
               + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + box(b"mdat", mdat_body) + moov
