"""PDF text extraction — the dominant non-HTML document format in web
crawls; a curation pipeline that drops every application/pdf response
loses a large slice of high-quality text.

Scope (honest): simple-font PDFs — literal `(...)`/hex `<...>` strings
shown with Tj/TJ/'/" operators inside Flate-compressed (or raw)
content streams, standard escape sequences, WinAnsi/Latin-1-ish byte
encodings. Composite/CID fonts (Identity-H with a CIDToGIDMap) encode
glyph IDs, not characters — those strings are SKIPPED (counted in the
return metadata) rather than emitted as garbage; a real-deployment
upgrade is a /ToUnicode CMap parser, a declared tail.

Layout knowledge is public (PDF 1.7 = ISO 32000-1): objects are
`N 0 obj ... endobj`, streams are `<<dict>> stream\\n ... endstream`,
page text lives in content streams as operators between BT/ET. We scan
for stream objects directly instead of walking the xref table — real
crawl PDFs frequently have broken xrefs, and every viewer falls back
to scanning; the text-bearing streams are self-identifying (they
contain BT/ET blocks).

The writer twin emits a complete, xref-correct single-font PDF so
fixtures are spec-layout files, not echoes of the extractor's
assumptions.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text", "write_pdf"]

_STREAM_RE = re.compile(
    rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S
)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # \ddd octal, up to 3 digits
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:
            out += nxt
            i += 2
    return bytes(out)


_TOK_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|\[|\]|T[jJdDf*]|'|\"|BT|ET",
    re.S,  # \\. must span backslash-newline line continuations
)


def _decode_simple(b: bytes) -> str:
    return b.decode("latin-1")


def extract_pdf_text(data: bytes) -> tuple[str, dict]:
    """PDF bytes → (text, meta). meta counts streams seen / text
    streams used / strings skipped (hex-CID). Text-block structure is
    preserved coarsely: ' / " / T* / TD / Td emit newlines, TJ pieces
    join directly, separate Tj runs join with nothing (PDF positions
    glyphs; whitespace between runs is a layout question — the literal
    strings themselves carry the spaces a writer emitted)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    pieces: list[str] = []
    meta = {"streams": 0, "text_streams": 0, "skipped_strings": 0}
    for m in _STREAM_RE.finditer(data):
        meta["streams"] += 1
        d, body = m.group(1), m.group(2)
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue  # broken/partial stream: skip, don't fail the doc
        if b"/Image" in d or b"BT" not in body:
            continue
        meta["text_streams"] += 1
        in_text = False
        for tok in _TOK_RE.finditer(body):
            t = tok.group(0)
            if t == b"BT":
                in_text = True
            elif t == b"ET":
                in_text = False
                pieces.append("\n")
            elif not in_text:
                continue
            elif t.startswith(b"("):
                # the token regex already bounds the literal (escaped
                # parens covered; bare nested parens — legal but
                # vanishingly rare, every writer escapes — split into
                # adjacent pieces, which concatenate back harmlessly)
                pieces.append(_decode_simple(_unescape(t[1:-1])))
            elif t.startswith(b"<"):
                # hex string: simple fonts are byte codes; CID fonts
                # are glyph ids — without the font dict we cannot tell,
                # so hex strings are skipped (counted) for honesty
                meta["skipped_strings"] += 1
            elif t in (b"'", b'"', b"T*", b"Td", b"TD"):
                if pieces and not pieces[-1].endswith("\n"):
                    pieces.append("\n")
    text = "".join(pieces)
    # collapse the coarse layout newlines: runs of blank lines → one
    text = re.sub(r"\n{2,}", "\n", text).strip("\n")
    return text, meta


def write_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Twin writer: list of page texts (lines separated by \\n) → a
    complete single-font PDF with a correct xref table. Each line
    becomes one Tj run followed by T*."""
    objs: list[bytes] = []

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    n_pages = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, text in enumerate(pages):
        content = b"BT /F1 11 Tf 50 780 Td 14 TL\n"
        for line in text.split("\n"):
            content += b"(" + esc(line).encode("latin-1") + b") Tj T*\n"
        content += b"ET"
        if compress:
            stream = zlib.compress(content, 6)
            sdict = (
                b"<< /Filter /FlateDecode /Length "
                + str(len(stream)).encode() + b" >>"
            )
        else:
            stream = content
            sdict = b"<< /Length " + str(len(stream)).encode() + b" >>"
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        objs.append(sdict + b"\nstream\n" + stream + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_pos).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)
