"""Crawl-ingestion sources (r6): WARC records (incl. per-record gzip
members) and WebDataset tar shards, twin-built plus hand-mangled
foreign layouts, then the distributed one-task-per-shard scans."""

import io
import tarfile

import numpy as np
import pytest

from trefoil_spark.sources.warc import (
    iter_warc_records,
    parse_http_response,
    warc_to_documents,
    write_warc,
)
from trefoil_spark.sources.webdataset import (
    group_samples,
    iter_tar_members,
    webdataset_to_samples,
    write_tar_shard,
)

RECS = [
    ("warcinfo", "urn:warcinfo", b"software: twin"),
    ("response", "http://example.com/a", "<html>alpha &amp; A</html>".encode()),
    ("request", "http://example.com/a", b"GET /a HTTP/1.1\r\n\r\n"),
    ("response", "http://example.com/b", "<html>béta</html>".encode()),
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    data = write_warc(RECS, gzip_members=gz)
    got = list(iter_warc_records(data))
    assert len(got) == 4
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "response", "request", "response"
    ]
    status, http, body = parse_http_response(got[1][1])
    assert status == 200
    assert http["content-type"] == "text/html"
    assert body == RECS[1][2]


def test_warc_malformed():
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"NOPE/1.0\r\n\r\n"))
    data = bytearray(write_warc(RECS[:2], gzip_members=False))
    # truncate the final payload: must raise, not silently shorten
    with pytest.raises(ValueError, match="overruns"):
        list(iter_warc_records(bytes(data[:-20])))
    # chunked is unwound as of late r6; malformed chunking still raises
    status, _hdrs, body = parse_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"3\r\nabc\r\n0\r\n\r\n"
    )
    assert status == 200 and body == b"abc"
    with pytest.raises(ValueError, match="chunk size"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\n"
        )
    with pytest.raises(ValueError, match="overruns payload"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nx"
        )


def test_tar_shard_roundtrip_and_foreign():
    samples = {
        "s/000": {"jpg": b"\xff\xd8fakejpeg", "txt": b"a caption",
                  "json": b"{}"},
        "s/001": {"jpg": b"\xff\xd8other", "txt": "café".encode()},
    }
    shard = write_tar_shard(samples)
    got = group_samples(iter_tar_members(shard))
    assert got == samples
    # foreign shard built by the stdlib with GNU format + long name
    buf = io.BytesIO()
    longkey = "deep/" + "x" * 140  # >100 chars forces a GNU 'L' entry
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tf:
        for name, payload in [
            (longkey + ".txt", b"long-name payload"),
            ("plain.txt", b"p"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    members = dict(iter_tar_members(buf.getvalue()))
    assert members[longkey + ".txt"] == b"long-name payload"
    assert members["plain.txt"] == b"p"
    # key split: only the LAST extension is the field
    assert "a/b.c" in group_samples([("a/b.c.jpg", b"z")])


def test_warc_to_documents_spark(spark, tmp_path):
    shards = []
    for s in range(3):
        recs = []
        for i in range(4):
            recs.append(
                ("response", f"http://ex.com/{s}/{i}",
                 f"<html>doc {s}-{i}</html>".encode())
            )
            recs.append(("request", f"http://ex.com/{s}/{i}", b"GET"))
        p = tmp_path / f"shard{s}.warc.gz"
        p.write_bytes(write_warc(recs))
        shards.append(str(p))
    df = warc_to_documents(spark, shards)
    rows = df.collect()
    assert len(rows) == 12  # responses only
    assert len({r["doc_id"] for r in rows}) == 12  # stable distinct ids
    urls = {r["url"] for r in rows}
    assert "http://ex.com/2/3" in urls
    one = next(r for r in rows if r["url"] == "http://ex.com/0/1")
    assert one["status"] == 200 and one["text"] == "<html>doc 0-1</html>"
    # determinism across re-ingest (cluster-size independence stand-in)
    again = {r["doc_id"] for r in warc_to_documents(spark, shards).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_webdataset_to_samples_spark(spark, tmp_path):
    rng = np.random.default_rng(9)
    paths = []
    for s in range(2):
        samples = {
            f"{s:03d}/{i:04d}": {
                "jpg": rng.integers(0, 256, 64, dtype=np.uint8).tobytes(),
                "txt": f"caption {s}-{i}".encode(),
            }
            for i in range(5)
        }
        if s == 0:  # one sample missing its caption: null field, no crash
            del samples["000/0000"]["txt"]
        p = tmp_path / f"wds-{s}.tar"
        p.write_bytes(write_tar_shard(samples))
        paths.append(str(p))
    df = webdataset_to_samples(spark, paths, fields=("jpg", "txt"))
    rows = {r["key"]: r for r in df.collect()}
    assert len(rows) == 10
    assert rows["001/0003"]["txt"] == b"caption 1-3"
    assert rows["000/0000"]["txt"] is None
    assert len(bytes(rows["000/0001"]["jpg"])) == 64


def test_curate_from_warc_end_to_end(spark, tmp_path):
    """WARC → extract → Gopher gate → exact dedup, one pipeline: the
    clean doc survives once (duplicate dropped, smallest doc_id wins),
    spam and non-HTML records never make it through."""
    from trefoil_spark.operators.curation import curate_from_warc

    good = " ".join(f"alpha{i} the bridge{i} of castle{i}" for i in range(20))
    spam = "- buy\n- now\n- cheap\n- pills"
    page = "<html><head><title>t</title></head><body><p>{}</p></body></html>"
    recs0 = [
        ("response", "http://ex.com/keep", page.format(good).encode()),
        ("response", "http://ex.com/spam", page.format(spam).encode()),
        ("request", "http://ex.com/keep", b"GET"),
    ]
    recs1 = [
        ("response", "http://ex.com/dup", page.format(good).encode()),
    ]
    p0 = tmp_path / "c0.warc.gz"
    p1 = tmp_path / "c1.warc.gz"
    p0.write_bytes(write_warc(recs0))
    p1.write_bytes(write_warc(recs1))
    out = curate_from_warc(spark, [str(p0), str(p1)]).collect()
    assert len(out) == 1
    row = out[0]
    # tag strip leaves the body text exactly (page template has no
    # other body content)
    assert row["text"] == good
    assert row["n_chars"] == len(good)
    # winner is the smaller doc_id of the two identical documents
    from trefoil_spark.sources.warc import warc_to_documents
    ids = {
        r["url"]: r["doc_id"]
        for r in warc_to_documents(spark, [str(p0), str(p1)]).collect()
    }
    assert row["doc_id"] == min(ids["http://ex.com/keep"],
                                ids["http://ex.com/dup"])


def _http_response(body, extra_headers=b""):
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + extra_headers
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            + b"\r\n" + body)


def _raw_warc_record(uri, http):
    return (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n" + http + b"\r\n\r\n")


def test_http_content_encoding_and_chunked(spark, tmp_path):
    """Real-crawl HTTP variety: gzip body, raw-deflate body, chunked
    body, chunked+gzip, and a corrupt-gzip record that must be SKIPPED
    (never fail the shard task)."""
    import zlib as _z

    from trefoil_spark.sources.warc import warc_to_documents

    html = b"<html><body>hello crawl body</body></html>"
    co = _z.compressobj(6, _z.DEFLATED, 31)
    gz = co.compress(html) + co.flush()
    co = _z.compressobj(6, _z.DEFLATED, -15)
    raw_deflate = co.compress(html) + co.flush()
    chunked = (b"%x\r\n" % 10) + html[:10] + b"\r\n" \
        + (b"%x\r\n" % (len(html) - 10)) + html[10:] + b"\r\n0\r\n\r\n"
    co = _z.compressobj(6, _z.DEFLATED, 31)
    gz2 = co.compress(html) + co.flush()
    chunked_gz = (b"%x\r\n" % len(gz2)) + gz2 + b"\r\n0\r\n\r\n"

    recs = b"".join([
        _raw_warc_record("http://a/gz",
                         _http_response(gz, b"Content-Encoding: gzip\r\n")),
        _raw_warc_record("http://a/defl",
                         _http_response(raw_deflate,
                                        b"Content-Encoding: deflate\r\n")),
        _raw_warc_record("http://a/chunk",
                         _http_response(chunked,
                                        b"Transfer-Encoding: chunked\r\n")),
        _raw_warc_record("http://a/chunkgz",
                         _http_response(chunked_gz,
                                        b"Transfer-Encoding: chunked\r\n"
                                        b"Content-Encoding: gzip\r\n")),
        _raw_warc_record("http://a/broken",
                         _http_response(b"\x1f\x8bnot really gzip",
                                        b"Content-Encoding: gzip\r\n")),
        _raw_warc_record("http://a/plain", _http_response(html)),
    ])
    p = tmp_path / "enc.warc"
    p.write_bytes(recs)
    out = {r["url"]: r["text"]
           for r in warc_to_documents(spark, [str(p)]).collect()}
    want = html.decode()
    assert out == {
        "http://a/gz": want, "http://a/defl": want,
        "http://a/chunk": want, "http://a/chunkgz": want,
        "http://a/plain": want,
    }  # the broken record is skipped, everything else decodes


def test_charset_decoding(spark, tmp_path):
    """Content-Type charset honored: latin-1 and windows-1252 pages
    decode correctly; a mislabeled charset falls back to UTF-8 with
    replacement instead of failing."""
    from trefoil_spark.sources.warc import warc_to_documents

    latin = "café naïve".encode("latin-1")
    cp = "curly “quotes”".encode("cp1252")
    recs = b"".join([
        _raw_warc_record(
            "http://c/latin",
            _http_response(
                latin, b"").replace(
                b"Content-Type: text/html",
                b"Content-Type: text/html; charset=ISO-8859-1"),
        ),
        _raw_warc_record(
            "http://c/cp1252",
            _http_response(cp, b"").replace(
                b"Content-Type: text/html",
                b'Content-Type: text/html; charset="windows-1252"'),
        ),
        _raw_warc_record(
            "http://c/mislabeled",
            _http_response(b"\xff\xfe\xfd", b"").replace(
                b"Content-Type: text/html",
                b"Content-Type: text/html; charset=us-ascii"),
        ),
    ])
    p = tmp_path / "cs.warc"
    p.write_bytes(recs)
    out = {r["url"]: r["text"]
           for r in warc_to_documents(spark, [str(p)]).collect()}
    assert out["http://c/latin"] == "café naïve"
    assert out["http://c/cp1252"] == "curly “quotes”"
    assert "�" in out["http://c/mislabeled"]  # replacement fallback


def test_probe_warc_media_routes_without_decoding(spark, tmp_path):
    """VERDICT r6 item 8: the header-only media probe as the crawl
    pipeline's pre-filter — payloads are ROUTED by codec (decode vs
    probe_only vs skip) without any decoder running. Fixture: PNG
    (decodable image), lossy WebP (probe_only while the VP8 default
    tables are placeholders), H.264 MP4 + MP3 (compressed: probe_only),
    WAV (decodable audio), garbage (skip); an HTML page proves non-media
    records never enter the stage."""
    import numpy as np

    from trefoil_spark.functions.mediainfo import build_mp3, mux_mp4
    from trefoil_spark.functions.png import encode_rgb_png
    from trefoil_spark.functions.vp8 import encode_webp_lossy
    from trefoil_spark.functions.wav import encode_wav
    from trefoil_spark.operators.curation import probe_warc_media

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    png = encode_rgb_png(img)
    webp = encode_webp_lossy(img, qi=40)
    mp4 = mux_mp4([{"kind": "video", "codec": "avc1",
                    "width": 640, "height": 480}], duration_ms=1000)
    mp3 = build_mp3(n_frames=4, kbps=128, rate=44100)
    wav = encode_wav(np.zeros((64, 1), np.int16), 16000)

    def rec(uri, ctype, payload):
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
                + b"\r\n\r\n" + payload)
        return (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: " + uri.encode() + b"\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
                + body + b"\r\n\r\n")

    blob = b"".join([
        rec("http://m/page", "text/html", b"<html>hi</html>"),
        rec("http://m/a.png", "image/png", png),
        rec("http://m/b.webp", "image/webp", webp),
        rec("http://m/c.mp4", "video/mp4", mp4),
        rec("http://m/d.mp3", "audio/mpeg", mp3),
        rec("http://m/e.wav", "audio/wav", wav),
        rec("http://m/f.bin", "application/octet-stream", b"\x00garbage"),
    ])
    p = tmp_path / "media.warc"
    p.write_bytes(blob)
    rows = {r["url"]: r for r in probe_warc_media(spark, str(p)).collect()}
    assert "http://m/page" not in rows            # pages never enter
    assert rows["http://m/a.png"]["route"] == "decode"
    assert rows["http://m/b.webp"]["route"] == "probe_only"  # VP8 strict
    assert rows["http://m/c.mp4"]["route"] == "probe_only"
    assert rows["http://m/c.mp4"]["codec"] == "avc1"
    assert rows["http://m/d.mp3"]["route"] == "probe_only"
    assert rows["http://m/e.wav"]["route"] == "decode"
    assert rows["http://m/f.bin"]["route"] == "skip"
    routed = sum(1 for r in rows.values() if r["route"] == "decode")
    probed = sum(1 for r in rows.values() if r["route"] == "probe_only")
    assert (routed, probed) == (2, 3)
