"""Test-local minimal HDF5 writer — builds spec-conformant fixtures for
structures the reference repo's real NetCDF-4 files don't exercise:
multi-chunk v1 chunk B-trees (3-D, edge chunks, deflate), and dense
(fractal-heap) group links. Assembled byte-by-byte from the public HDF5
File Format Specification; NOT a product feature (the engine is
read-only for HDF5) — purely a fixture generator so the reader's
many-chunk and dense-link paths are testable without libhdf5.

Checksums (v2 structures) are written as zeros — the reader never
verifies them (documented in sources/hdf5.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF8 = b"\xff" * 8


class _Builder:
    def __init__(self, size: int = 1 << 16):
        self.buf = bytearray(size)
        self.cursor = 4096  # superblock + root live below

    def alloc(self, data: bytes, align: int = 8) -> int:
        addr = (self.cursor + align - 1) // align * align
        self.buf[addr : addr + len(data)] = data
        self.cursor = addr + len(data)
        return addr

    def place(self, addr: int, data: bytes):
        self.buf[addr : addr + len(data)] = data

    def bytes(self) -> bytes:
        return bytes(self.buf[: max(self.cursor, 4096)])


def _v1_msg(mtype: int, body: bytes) -> bytes:
    body = body + b"\x00" * (-len(body) % 8)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _v1_header(msgs: list[tuple[int, bytes]]) -> bytes:
    body = b"".join(_v1_msg(t, b) for t, b in msgs)
    return (
        struct.pack("<BxHI", 1, len(msgs), 1)
        + struct.pack("<I", len(body))
        + b"\x00" * 4
        + body
    )


def _dataspace_v1(dims: list[int]) -> bytes:
    return struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims
    )


def _datatype(kind: str) -> bytes:
    if kind == "i4":
        return struct.pack("<BBBBI", 0x10, 0x08, 0, 0, 4) + struct.pack("<HH", 0, 32)
    if kind == "f8":
        # IEEE little-endian float64 (class 1 v1): sign 63, exp 52/11
        # bias 1023, mantissa 0/52
        return struct.pack("<BBBBI", 0x11, 0x20, 0x3F, 0, 8) + struct.pack(
            "<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023
        )
    raise ValueError(kind)


def _attr_v1(name: str, kind: str, payload: bytes, dims: list[int]) -> bytes:
    nm = name.encode() + b"\x00"
    if kind == "str":
        dt = struct.pack("<BBBBI", 0x13, 0, 0, 0, len(payload))
    else:
        dt = _datatype(kind)
    ds = _dataspace_v1(dims) if dims else struct.pack("<BBB5x", 1, 0, 0)
    out = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    out += nm + b"\x00" * (-len(nm) % 8)
    out += dt + b"\x00" * (-len(dt) % 8)
    out += ds + b"\x00" * (-len(ds) % 8)
    return out + payload


def _contiguous_dataset(
    bld: _Builder, arr: np.ndarray, kind: str, attrs: list[tuple[str, str, bytes, list]]
) -> int:
    data_addr = bld.alloc(arr.tobytes())
    msgs = [
        (0x0001, _dataspace_v1(list(arr.shape))),
        (0x0003, _datatype(kind)),
        (
            0x0008,
            struct.pack("<BBB5x", 1, max(len(arr.shape), 1), 1)
            + struct.pack("<Q", data_addr)
            + b"".join(struct.pack("<I", s) for s in arr.shape),
        ),
    ]
    for nm, k, payload, dims in attrs:
        msgs.append((0x000C, _attr_v1(nm, k, payload, dims)))
    return bld.alloc(_v1_header(msgs))


def _chunked_dataset(
    bld: _Builder,
    arr: np.ndarray,
    chunk: tuple[int, ...],
    kind: str,
    deflate: bool,
    attrs: list[tuple[str, str, bytes, list]],
) -> int:
    nd = len(arr.shape)
    # write chunks (edge chunks stored FULL-SIZE, zero-padded, per spec)
    entries = []
    ranges = [range(0, s, c) for s, c in zip(arr.shape, chunk)]
    offs_list = [()]
    for r in ranges:
        offs_list = [o + (v,) for o in offs_list for v in r]
    for offs in offs_list:
        full = np.zeros(chunk, dtype=arr.dtype)
        sl = tuple(
            slice(o, min(o + c, s)) for o, c, s in zip(offs, chunk, arr.shape)
        )
        sub = arr[sl]
        full[tuple(slice(0, x) for x in sub.shape)] = sub
        raw = full.tobytes()
        if deflate:
            raw = zlib.compress(raw, 6)
        addr = bld.alloc(raw)
        entries.append((offs, addr, len(raw)))
    # v1 chunk b-tree: single leaf
    bt = bytearray()
    bt += b"TREE" + struct.pack("<BBH", 1, 0, len(entries)) + UNDEF8 + UNDEF8
    for offs, addr, size in entries:
        bt += struct.pack("<II", size, 0)
        bt += b"".join(struct.pack("<Q", o) for o in offs) + struct.pack("<Q", 0)
        bt += struct.pack("<Q", addr)
    # trailing key (right-edge sentinel)
    bt += struct.pack("<II", 0, 0) + b"\x00" * (8 * (nd + 1))
    bt_addr = bld.alloc(bytes(bt))
    msgs = [
        (0x0001, _dataspace_v1(list(arr.shape))),
        (0x0003, _datatype(kind)),
        (
            0x0008,
            struct.pack("<BBB", 3, 2, nd + 1)
            + struct.pack("<Q", bt_addr)
            + b"".join(struct.pack("<I", c) for c in chunk)
            + struct.pack("<I", arr.dtype.itemsize),
        ),
    ]
    if deflate:
        # filter pipeline v1: deflate (id 1), 1 client value (level)
        msgs.append(
            (
                0x000B,
                struct.pack("<BB6x", 1, 1)
                + struct.pack("<HHHH", 1, 0, 1, 1)
                + struct.pack("<I", 6)
                + b"\x00" * 4,
            )
        )
    for nm, k, payload, dims in attrs:
        msgs.append((0x000C, _attr_v1(nm, k, payload, dims)))
    return bld.alloc(_v1_header(msgs))


def _symbol_table_root(bld: _Builder, links: list[tuple[str, int]]) -> int:
    heap_data = bytearray(b"\x00" * 8)
    name_offs = []
    for nm, _ in links:
        name_offs.append(len(heap_data))
        heap_data += nm.encode() + b"\x00"
    heap_data += b"\x00" * (-len(heap_data) % 8)
    hd_addr = bld.alloc(bytes(heap_data))
    heap = b"HEAP" + struct.pack("<B3x", 0) + struct.pack(
        "<QQQ", len(heap_data), len(heap_data), hd_addr
    )
    heap_addr = bld.alloc(heap)
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(links))
    for (nm, ohdr), noff in sorted(zip(links, name_offs)):
        snod += struct.pack("<QQI4x16x", noff, ohdr, 0)
    snod_addr = bld.alloc(snod)
    bt = b"TREE" + struct.pack("<BBH", 0, 0, 1) + UNDEF8 + UNDEF8
    bt += struct.pack("<Q", 0) + struct.pack("<Q", snod_addr) + struct.pack("<Q", 8)
    bt_addr = bld.alloc(bt)
    root = _v1_header(
        [(0x0011, struct.pack("<QQ", bt_addr, heap_addr))]
    )
    return bld.alloc(root)


def _link_msg(name: str, ohdr: int) -> bytes:
    nm = name.encode()
    return struct.pack("<BBB", 1, 0, len(nm)) + nm + struct.pack("<Q", ohdr)


def _dense_link_root(bld: _Builder, links: list[tuple[str, int]]) -> int:
    """Root group whose links live in a fractal heap + v2 name B-tree —
    the dense storage netCDF-4 uses past the compact threshold."""
    # fractal heap direct block: header (no checksum) + link messages
    OFFB = 2  # max_heap_bits 16 → 2-byte heap offsets
    LENB = 2  # max_direct 1024 → 2-byte lengths
    hid_len = 1 + OFFB + LENB
    objects = []
    db = bytearray(b"FHDB" + struct.pack("<B", 0) + b"\x00" * 8 + b"\x00" * OFFB)
    for nm, ohdr in links:
        msg = _link_msg(nm, ohdr)
        objects.append((len(db), len(msg)))
        db += msg
    start_bs = 1024
    db += b"\x00" * (start_bs - len(db))
    db_addr = bld.alloc(bytes(db))
    # FRHP header (only reader-consumed fields populated)
    frhp = bytearray(142)
    frhp[0:4] = b"FRHP"
    frhp[4] = 0
    frhp[5:7] = struct.pack("<H", hid_len)
    frhp[7:9] = struct.pack("<H", 0)
    frhp[9] = 0  # no checksum in direct blocks
    frhp[110:112] = struct.pack("<H", 4)            # table width
    frhp[112:120] = struct.pack("<Q", start_bs)     # starting block size
    frhp[120:128] = struct.pack("<Q", 1024)         # max direct size
    frhp[128:130] = struct.pack("<H", 16)           # max heap size bits
    frhp[130:132] = struct.pack("<H", 1)            # starting rows
    frhp[132:140] = struct.pack("<Q", db_addr)      # root block
    frhp[140:142] = struct.pack("<H", 0)
    frhp_addr = bld.alloc(bytes(frhp))
    # v2 b-tree (type 5: link name index), single leaf
    rec_size = 4 + hid_len
    leaf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for off, ln in objects:
        leaf += struct.pack("<I", 0)  # name hash (reader ignores)
        leaf += struct.pack("<B", 0) + struct.pack("<H", off) + struct.pack("<H", ln)
    leaf += b"\x00" * 4  # checksum (unverified)
    leaf_addr = bld.alloc(bytes(leaf))
    bthd = bytearray(34 + 2 + 4)
    bthd[0:4] = b"BTHD"
    bthd[4] = 0
    bthd[5] = 5
    bthd[6:10] = struct.pack("<I", 512)
    bthd[10:12] = struct.pack("<H", rec_size)
    bthd[12:14] = struct.pack("<H", 0)  # depth
    bthd[16:24] = struct.pack("<Q", leaf_addr)
    bthd[24:26] = struct.pack("<H", len(objects))
    bthd_addr = bld.alloc(bytes(bthd))
    # root group header: link info message with fheap + name index
    li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    return bld.alloc(_v1_header([(0x0002, li)]))


def _superblock_v0(root_ohdr: int, eof: int) -> bytes:
    sb = b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<Q", 0) + UNDEF8 + struct.pack("<Q", eof) + UNDEF8
    sb += struct.pack("<QQI4x16x", 0, root_ohdr, 0)
    return sb


def build_multichunk_nc4(path: str, deflate: bool = True) -> np.ndarray:
    """3-D (time=2, y=5, x=7) int32 variable in (1,3,4) chunks (8 chunks,
    partial at both edges) + f8 coordinate DIMENSION_SCALE datasets; dim
    mapping exercises the size-match fallback (no DIMENSION_LIST)."""
    bld = _Builder()
    t, h, w = 2, 5, 7
    rng = np.arange(t * h * w, dtype="<i4").reshape(t, h, w)
    arr = (rng * 7 + 3) % 1000
    ys = (50.0 - np.arange(h) * 1.0).astype("<f8")
    xs = (10.0 + np.arange(w) * 1.0).astype("<f8")
    ts = np.arange(t).astype("<f8")
    scale = [("CLASS", "str", b"DIMENSION_SCALE\x00", [])]
    y_oh = _contiguous_dataset(
        bld, ys, "f8", scale + [("standard_name", "str", b"latitude\x00", [])]
    )
    x_oh = _contiguous_dataset(
        bld, xs, "f8", scale + [("standard_name", "str", b"longitude\x00", [])]
    )
    t_oh = _contiguous_dataset(bld, ts, "f8", scale)
    v_oh = _chunked_dataset(
        bld, arr, (1, 3, 4), "i4", deflate,
        [("units", "str", b"K\x00", [])],
    )
    root = _symbol_table_root(
        bld, [("time", t_oh), ("y", y_oh), ("x", x_oh), ("v", v_oh)]
    )
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return arr


def build_dense_links_file(path: str, n_vars: int = 12) -> dict[str, np.ndarray]:
    """Root group with ``n_vars`` datasets linked DENSELY (fractal heap +
    v2 name B-tree) — past netCDF-4's compact-link threshold."""
    bld = _Builder()
    out = {}
    links = []
    for i in range(n_vars):
        arr = (np.arange(4, dtype="<i4") * (i + 1)).reshape(2, 2)
        name = f"var{i:02d}"
        out[name] = arr
        links.append((name, _contiguous_dataset(bld, arr, "i4", [])))
    root = _dense_link_root(bld, links)
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return out


def _fletcher_chunked_dataset(bld: _Builder, arr: np.ndarray, chunk, kind: str) -> int:
    """Chunked dataset with the FLETCHER32 filter (id 3): 4-byte checksum
    appended per chunk (reader strips, never verifies)."""
    nd = len(arr.shape)
    entries = []
    ranges = [range(0, s, c) for s, c in zip(arr.shape, chunk)]
    offs_list = [()]
    for r in ranges:
        offs_list = [o + (v,) for o in offs_list for v in r]
    for offs in offs_list:
        full = np.zeros(chunk, dtype=arr.dtype)
        sl = tuple(slice(o, min(o + c, s)) for o, c, s in zip(offs, chunk, arr.shape))
        sub = arr[sl]
        full[tuple(slice(0, x) for x in sub.shape)] = sub
        raw = full.tobytes() + b"\xde\xad\xbe\xef"  # unverified checksum
        entries.append((offs, bld.alloc(raw), len(raw)))
    bt = bytearray(b"TREE" + struct.pack("<BBH", 1, 0, len(entries)) + UNDEF8 + UNDEF8)
    for offs, addr, size in entries:
        bt += struct.pack("<II", size, 0)
        bt += b"".join(struct.pack("<Q", o) for o in offs) + struct.pack("<Q", 0)
        bt += struct.pack("<Q", addr)
    bt += struct.pack("<II", 0, 0) + b"\x00" * (8 * (nd + 1))
    bt_addr = bld.alloc(bytes(bt))
    msgs = [
        (0x0001, _dataspace_v1(list(arr.shape))),
        (0x0003, _datatype(kind)),
        (0x0008,
         struct.pack("<BBB", 3, 2, nd + 1) + struct.pack("<Q", bt_addr)
         + b"".join(struct.pack("<I", c) for c in chunk)
         + struct.pack("<I", arr.dtype.itemsize)),
        # filter pipeline v1: fletcher32 (id 3), zero client values
        (0x000B,
         struct.pack("<BB6x", 1, 1) + struct.pack("<HHHH", 3, 0, 1, 0)),
    ]
    return bld.alloc(_v1_header(msgs))


def _dense_link_root_indirect(bld: _Builder, links: list[tuple[str, int]]) -> int:
    """Dense link root whose fractal heap uses an INDIRECT root block
    (FHIB) with multiple small direct blocks — exercises the doubling-
    table walk the single-FHDB fixtures never touch."""
    OFFB = 2
    LENB = 2
    hid_len = 1 + OFFB + LENB
    start_bs = 64  # tiny: forces several direct blocks
    width = 4
    db_hdr = 4 + 1 + 8 + OFFB
    # pack link messages into as many direct blocks as needed
    blocks = []  # (heap_offset, bytes)
    objects = []  # (heap_offset_of_object, length)
    cur = bytearray(b"FHDB" + struct.pack("<B", 0) + b"\x00" * 8 + b"\x00" * OFFB)
    cur_base = 0
    for nm, ohdr in links:
        msg = _link_msg(nm, ohdr)
        if len(cur) + len(msg) > start_bs:
            blocks.append((cur_base, bytes(cur) + b"\x00" * (start_bs - len(cur))))
            cur_base += start_bs
            cur = bytearray(b"FHDB" + struct.pack("<B", 0) + b"\x00" * 8)
            cur += struct.pack("<H", cur_base)  # block offset field (OFFB=2)
        objects.append((cur_base + len(cur), len(msg)))
        cur += msg
    blocks.append((cur_base, bytes(cur) + b"\x00" * (start_bs - len(cur))))
    db_addrs = [bld.alloc(b) for _off, b in blocks]
    # FHIB root: sig, ver, heap hdr addr, block offset, then child addrs
    # row0 + row1 at start_bs (2*width direct slots before doubling)
    fhib = bytearray(b"FHIB" + struct.pack("<B", 0) + b"\x00" * 8 + b"\x00" * OFFB)
    nslots = 2 * width  # enough for our few blocks
    for i in range(nslots):
        fhib += struct.pack("<Q", db_addrs[i] if i < len(db_addrs) else 0xFFFFFFFFFFFFFFFF)
    fhib_addr = bld.alloc(bytes(fhib))
    frhp = bytearray(142)
    frhp[0:4] = b"FRHP"
    frhp[5:7] = struct.pack("<H", hid_len)
    frhp[9] = 0
    frhp[110:112] = struct.pack("<H", width)
    frhp[112:120] = struct.pack("<Q", start_bs)
    frhp[120:128] = struct.pack("<Q", 1024)
    frhp[128:130] = struct.pack("<H", 16)
    frhp[130:132] = struct.pack("<H", 1)
    frhp[132:140] = struct.pack("<Q", fhib_addr)
    # current # rows in root indirect block: the reader bounds its
    # doubling-table walk by this (r5 ADVICE fix) — 2 start_bs rows
    frhp[140:142] = struct.pack("<H", 2)
    frhp_addr = bld.alloc(bytes(frhp))
    rec_size = 4 + hid_len
    leaf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for off, ln in objects:
        leaf += struct.pack("<I", 0) + struct.pack("<B", 0)
        leaf += struct.pack("<H", off) + struct.pack("<H", ln)
    leaf += b"\x00" * 4
    leaf_addr = bld.alloc(bytes(leaf))
    bthd = bytearray(40)
    bthd[0:4] = b"BTHD"
    bthd[5] = 5
    bthd[6:10] = struct.pack("<I", 512)
    bthd[10:12] = struct.pack("<H", rec_size)
    bthd[12:14] = struct.pack("<H", 0)
    bthd[16:24] = struct.pack("<Q", leaf_addr)
    bthd[24:26] = struct.pack("<H", len(objects))
    bthd_addr = bld.alloc(bytes(bthd))
    li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    return bld.alloc(_v1_header([(0x0002, li)]))


def build_fletcher_file(path: str) -> np.ndarray:
    bld = _Builder()
    arr = (np.arange(6 * 10, dtype="<i4").reshape(6, 10) * 3 + 1) % 500
    v_oh = _fletcher_chunked_dataset(bld, arr, (4, 4), "i4")
    root = _symbol_table_root(bld, [("v", v_oh)])
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return arr


def build_indirect_heap_links_file(path: str, n_vars: int = 9) -> dict:
    bld = _Builder()
    out = {}
    links = []
    for i in range(n_vars):
        arr = (np.arange(4, dtype="<i4") + 10 * i).reshape(2, 2)
        name = f"w{i:02d}"
        out[name] = arr
        links.append((name, _contiguous_dataset(bld, arr, "i4", [])))
    root = _dense_link_root_indirect(bld, links)
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return out


def _superblock_v1(root_ohdr: int, eof: int) -> bytes:
    """v1 superblock: v0 + 4 extra bytes (indexed-storage internal-node
    K + reserved) before the base-address block — shifts the root entry
    from 56 to 60."""
    sb = b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<BBBBBBBB", 1, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<HH", 32, 0)  # indexed-storage K + reserved (v1 only)
    sb += struct.pack("<Q", 0) + UNDEF8 + struct.pack("<Q", eof) + UNDEF8
    sb += struct.pack("<QQI4x16x", 0, root_ohdr, 0)
    return sb


def build_v1_superblock_file(path: str) -> np.ndarray:
    bld = _Builder()
    arr = (np.arange(12, dtype="<i4") * 5 + 2).reshape(3, 4)
    v_oh = _contiguous_dataset(bld, arr, "i4", [])
    root = _symbol_table_root(bld, [("v", v_oh)])
    data = bld.bytes()
    bld.place(0, _superblock_v1(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return arr


# ---------------------------------------------------------------------------
# layout v4 chunk indexes (HDF5 1.10 "latest format"): single chunk,
# implicit, fixed array (unpaged + paged) — the r5 tail closure fixtures
# ---------------------------------------------------------------------------


def _layout_v4_msg(
    chunk, itemsize: int, itype: int, extra: bytes, addr: int,
    flags: int = 0, elem_dim: bool = True,
) -> bytes:
    """Data Layout message v4, class 2 (chunked). elem_dim toggles the
    trailing element-size pseudo-dimension (libhdf5's shared-struct
    convention) vs bare-rank dims — the reader accepts both, and the
    fixtures exercise both encodings."""
    dims = list(chunk) + ([itemsize] if elem_dim else [])
    body = struct.pack("<BBBBB", 4, 2, flags, len(dims), 4)
    body += b"".join(struct.pack("<I", x) for x in dims)
    body += struct.pack("<B", itype) + extra + struct.pack("<Q", addr)
    return body


def _chunk_blobs(arr: np.ndarray, chunk, deflate: bool) -> list[bytes]:
    """Row-major (last dim fastest) chunk payloads, edge chunks padded."""
    ranges = [range(0, s, c) for s, c in zip(arr.shape, chunk)]
    offs_list = [()]
    for r in ranges:
        offs_list = [o + (v,) for o in offs_list for v in r]
    blobs = []
    for offs in offs_list:
        full = np.zeros(chunk, dtype=arr.dtype)
        sl = tuple(
            slice(o, min(o + c, s)) for o, c, s in zip(offs, chunk, arr.shape)
        )
        sub = arr[sl]
        full[tuple(slice(0, x) for x in sub.shape)] = sub
        raw = full.tobytes()
        if deflate:
            raw = zlib.compress(raw, 6)
        blobs.append(raw)
    return blobs


_DEFLATE_MSG = (
    0x000B,
    struct.pack("<BB6x", 1, 1)
    + struct.pack("<HHHH", 1, 0, 1, 1)
    + struct.pack("<I", 6)
    + b"\x00" * 4,
)


def _fixed_array(bld: _Builder, elems: list[bytes], entry_size: int,
                 client: int, page_bits: int) -> int:
    """FAHD header + FADB data block; pages (bitmap all-set + per-page
    checksums) when len(elems) exceeds one page."""
    max_n = len(elems)
    page_elems = 1 << page_bits
    body = bytearray(b"FADB" + struct.pack("<BB", 0, client))
    body += struct.pack("<Q", 0)  # header address (backpointer, unread)
    if max_n > page_elems:
        npages = (max_n + page_elems - 1) // page_elems
        bitmap = bytearray((npages + 7) // 8)
        for pg in range(npages):
            bitmap[pg // 8] |= 1 << (pg % 8)
        body += bitmap + b"\x00" * 4  # bitmap + data-block checksum
        for pg in range(npages):
            for e in elems[pg * page_elems : (pg + 1) * page_elems]:
                body += e
            body += b"\x00" * 4  # page checksum (unverified)
    else:
        for e in elems:
            body += e
        body += b"\x00" * 4  # checksum
    dblk_addr = bld.alloc(bytes(body))
    hdr = b"FAHD" + struct.pack("<BBBB", 0, client, entry_size, page_bits)
    hdr += struct.pack("<QQ", max_n, dblk_addr) + b"\x00" * 4
    return bld.alloc(hdr)


def _enc_width(v: int) -> int:
    """Spec sizing rule (independent twin of the reader's): min bytes
    for values ≤ v = floor(log2 v)/8 + 1."""
    return (max(int(v), 1).bit_length() - 1) // 8 + 1


def _btree_v2_index(bld: _Builder, recs: list[bytes], rrec_size: int,
                    btype: int, node_size: int = 2048) -> int:
    """Version-2 B-tree over encoded chunk records (File Format Spec
    v3.0 §III.A.2): BTHD header + one BTLF leaf, or — when the records
    overflow one leaf — a depth-1 tree with a BTIN root holding the
    separator records and (addr, nrec) child pointers."""
    cap = (node_size - 10) // rrec_size
    nrec_w = _enc_width(cap)
    total = len(recs)
    if total <= cap:
        leaf = (b"BTLF" + struct.pack("<BB", 0, btype)
                + b"".join(recs) + b"\x00" * 4)
        root_addr, depth, root_nrec = bld.alloc(leaf), 0, total
    else:
        k = (total + cap) // (cap + 1)  # leaves; k-1 separators in root
        while total - (k - 1) > k * cap:
            k += 1
        per, rem = divmod(total - (k - 1), k)
        ptr_sz = 8 + nrec_w
        int_cap = (node_size - 10 - ptr_sz) // (rrec_size + ptr_sz)
        assert k - 1 <= int_cap, "fixture would need depth 2"
        children, seps, i = [], [], 0
        for li in range(k):
            n = per + (1 if li < rem else 0)
            leaf = (b"BTLF" + struct.pack("<BB", 0, btype)
                    + b"".join(recs[i : i + n]) + b"\x00" * 4)
            children.append((bld.alloc(leaf), n))
            i += n
            if li < k - 1:
                seps.append(recs[i])
                i += 1
        assert i == total
        body = bytearray(b"BTIN" + struct.pack("<BB", 0, btype))
        for s in seps:
            body += s
        for addr, n in children:
            body += struct.pack("<Q", addr) + n.to_bytes(nrec_w, "little")
        body += b"\x00" * 4
        root_addr, depth, root_nrec = bld.alloc(bytes(body)), 1, k - 1
    hdr = (b"BTHD" + struct.pack("<BB", 0, btype)
           + struct.pack("<IHHBB", node_size, rrec_size, depth, 100, 40)
           + struct.pack("<QHQ", root_addr, root_nrec, total)
           + b"\x00" * 4)
    return bld.alloc(hdr)


def _dataspace_v1_unlim(dims: list[int]) -> bytes:
    """v1 dataspace with the maxdims flag set and dim 0 unlimited — the
    shape HDF5 emits for appendable (time-unlimited) variables.  The
    reader uses current dims only; maxdims ride along for realism."""
    body = struct.pack("<BBB5x", 1, len(dims), 1)
    body += b"".join(struct.pack("<Q", d) for d in dims)
    body += UNDEF8  # dim 0: H5S_UNLIMITED
    body += b"".join(struct.pack("<Q", d) for d in dims[1:])
    return body


def _ext_array(
    bld: _Builder, elems: list[bytes], esize: int, client: int,
    maxbits: int, iblk_elmts: int, dmin: int, smin: int, pbits: int,
) -> int:
    """EAHD + EAIB + EADB/EASB extensible-array chunk index, laid out
    per the public HDF5 File Format Specification v3.0: element i in
    the index block if i < iblk_elmts, else in super block
    s = floor(log2(rel/dmin + 1)) (2^(s//2) data blocks of
    dmin*2^((s+1)//2) elements); the first 2*log2(smin) super blocks'
    data blocks are addressed from the index block's 2*(smin-1) direct
    slots, later ones via EASB; data blocks larger than 2^pbits
    elements are paged (prefix+checksum, then pages each with its own
    checksum)."""
    undef_elem = UNDEF8 + b"\x00" * (esize - 8)
    off_size = (maxbits + 7) // 8
    page_elems = 1 << pbits
    log2smin = smin.bit_length() - 1
    nsblk_iblk = 2 * log2smin
    ndblk_addrs = 2 * (smin - 1)
    # total super-block slot count: enough capacity for 2^maxbits elems
    nsblks_total, cap = 0, iblk_elmts
    while cap < (1 << maxbits):
        cap += dmin * (1 << nsblks_total)  # sblk s capacity = dmin * 2^s
        nsblks_total += 1

    iblk_elems = list(elems[:iblk_elmts])
    iblk_elems += [undef_elem] * (iblk_elmts - len(iblk_elems))
    rem = elems[iblk_elmts:]
    direct_addrs: list[int | None] = []
    sblk_addrs: list[int | None] = []
    pos, s = 0, 0
    while pos < len(rem):
        ndblks_s = 1 << (s // 2)
        dblk_nelmts = dmin << ((s + 1) // 2)
        npages = dblk_nelmts // page_elems if dblk_nelmts > page_elems else 0
        daddrs: list[int | None] = []
        for _ in range(ndblks_s):
            block = rem[pos : pos + dblk_nelmts]
            pos += dblk_nelmts
            if not block:
                daddrs.append(None)
                continue
            block = block + [undef_elem] * (dblk_nelmts - len(block))
            body = bytearray(b"EADB")
            body += struct.pack("<BB", 0, client) + struct.pack("<Q", 0)
            body += (0).to_bytes(off_size, "little")  # block offset
            if npages:
                body += b"\x00" * 4  # block checksum; pages follow
                for pg in range(npages):
                    for e in block[pg * page_elems : (pg + 1) * page_elems]:
                        body += e
                    body += b"\x00" * 4  # page checksum (unverified)
            else:
                for e in block:
                    body += e
                body += b"\x00" * 4
            daddrs.append(bld.alloc(bytes(body)))
        if s < nsblk_iblk:
            direct_addrs.extend(daddrs)
        else:
            sb = bytearray(b"EASB")
            sb += struct.pack("<BB", 0, client) + struct.pack("<Q", 0)
            sb += (0).to_bytes(off_size, "little")
            if npages:
                bitmap = bytearray((ndblks_s * npages + 7) // 8)
                bit = 0
                for a in daddrs:
                    for _ in range(npages):
                        if a is not None:
                            bitmap[bit // 8] |= 1 << (bit % 8)
                        bit += 1
                sb += bitmap
            for a in daddrs:
                sb += UNDEF8 if a is None else struct.pack("<Q", a)
            sb += b"\x00" * 4
            sblk_addrs.append(bld.alloc(bytes(sb)))
        s += 1
    direct_addrs += [None] * (ndblk_addrs - len(direct_addrs))
    sblk_addrs += [None] * (max(0, nsblks_total - nsblk_iblk)
                            - len(sblk_addrs))
    ib = bytearray(b"EAIB")
    ib += struct.pack("<BB", 0, client) + struct.pack("<Q", 0)
    for e in iblk_elems:
        ib += e
    for a in direct_addrs + sblk_addrs:
        ib += UNDEF8 if a is None else struct.pack("<Q", a)
    ib += b"\x00" * 4
    iblk_addr = bld.alloc(bytes(ib))
    hdr = b"EAHD" + struct.pack(
        "<BBBBBBBB", 0, client, esize, maxbits, iblk_elmts, dmin, smin, pbits
    )
    hdr += b"\x00" * 48  # stats (unread by this repo's parser)
    hdr += struct.pack("<Q", iblk_addr) + b"\x00" * 4
    return bld.alloc(hdr)


EA_SMALL = dict(maxbits=16, iblk_elmts=2, dmin=2, smin=2, pbits=2)
EA_DEFAULT = dict(maxbits=32, iblk_elmts=4, dmin=16, smin=4, pbits=10)


def _dataset_v4_chunked(
    bld: _Builder, arr: np.ndarray, chunk, kind: str, itype: int,
    deflate: bool = False, elem_dim: bool = True, page_bits: int = 5,
    ea_params: dict | None = None, unlim: bool = False,
    bt2_node_size: int = 2048,
) -> int:
    blobs = _chunk_blobs(arr, chunk, deflate)
    extra = b""
    flags = 0
    if itype == 1:  # single chunk
        assert len(blobs) == 1
        addr = bld.alloc(blobs[0])
        if deflate:
            flags = 0x02  # single chunk with filter: size + mask inline
            extra = struct.pack("<QI", len(blobs[0]), 0)
    elif itype == 2:  # implicit: equal-size raw chunks, contiguous
        assert not deflate
        addr = bld.alloc(b"".join(blobs))
    elif itype in (3, 4):  # fixed array / extensible array
        addrs = [bld.alloc(b) for b in blobs]
        client = 1 if deflate else 0
        entry_size = 20 if deflate else 8  # addr + size(8) + mask(4)
        elems = []
        for a, raw in zip(addrs, blobs):
            e = struct.pack("<Q", a)
            if deflate:
                e += struct.pack("<QI", len(raw), 0)
            elems.append(e)
        if itype == 3:
            addr = _fixed_array(bld, elems, entry_size, client, page_bits)
            extra = struct.pack("<B", page_bits)
        else:
            ea = dict(ea_params or EA_DEFAULT)
            addr = _ext_array(bld, elems, entry_size, client, **ea)
            extra = struct.pack(
                "<BBBBB", ea["maxbits"], ea["iblk_elmts"], ea["smin"],
                ea["dmin"], ea["pbits"],
            )
    elif itype == 5:  # v2 B-tree: records carry scaled (grid) offsets
        addrs = [bld.alloc(b) for b in blobs]
        ranges = [range(0, s, c) for s, c in zip(arr.shape, chunk)]
        offs_list = [()]
        for r in ranges:
            offs_list = [o + (v,) for o in offs_list for v in r]
        chunk_bytes = arr.dtype.itemsize
        for c in chunk:
            chunk_bytes *= c
        size_len = _enc_width(chunk_bytes)
        recs = []
        for offs, a, raw in zip(offs_list, addrs, blobs):
            r = struct.pack("<Q", a)
            if deflate:
                r += len(raw).to_bytes(size_len, "little")
                r += struct.pack("<I", 0)
            r += b"".join(
                struct.pack("<Q", o // c) for o, c in zip(offs, chunk)
            )
            recs.append(r)
        rrec_size = len(recs[0])
        btype = 11 if deflate else 10
        addr = _btree_v2_index(bld, recs, rrec_size, btype, bt2_node_size)
        extra = struct.pack("<IBB", bt2_node_size, 100, 40)
    else:
        raise ValueError(f"itype {itype}")
    space = _dataspace_v1_unlim if unlim else _dataspace_v1
    msgs = [
        (0x0001, space(list(arr.shape))),
        (0x0003, _datatype(kind)),
        (0x0008, _layout_v4_msg(chunk, arr.dtype.itemsize, itype, extra,
                                addr, flags, elem_dim)),
    ]
    if deflate:
        msgs.append(_DEFLATE_MSG)
    return bld.alloc(_v1_header(msgs))


def build_v4_index_file(path: str) -> dict[str, np.ndarray]:
    """One file, every supported v4 index shape + a v1-B-tree twin of the
    fixed-array variable for tile-identity assertions."""
    bld = _Builder(1 << 17)
    small = (np.arange(5 * 7, dtype="<i4").reshape(5, 7) * 3 - 11)
    big = ((np.arange(12 * 10, dtype="<i4").reshape(12, 10) * 7 + 5) % 1000)
    out: dict[str, np.ndarray] = {}
    links = []

    def add(name, oh, arr):
        out[name] = arr
        links.append((name, oh))

    add("single", _dataset_v4_chunked(bld, small, (5, 7), "i4", 1,
                                      deflate=True), small)
    add("single_raw", _dataset_v4_chunked(bld, small, (5, 7), "i4", 1,
                                          deflate=False, elem_dim=False), small)
    add("implicit", _dataset_v4_chunked(bld, big, (4, 4), "i4", 2), big)
    add("fixedarr", _dataset_v4_chunked(bld, big, (4, 4), "i4", 3,
                                        deflate=True), big)
    add("fixedarr_paged", _dataset_v4_chunked(bld, big, (4, 4), "i4", 3,
                                              deflate=False, elem_dim=False,
                                              page_bits=2), big)
    add("twin", _chunked_dataset(bld, big, (4, 4), "i4", True, []), big)
    root = _symbol_table_root(bld, links)
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return out


def build_earray_file(path: str) -> dict[str, np.ndarray]:
    """Extensible-array chunk indexes (unlimited dim 0), one variable
    per structural regime: all-in-index-block, direct data blocks,
    secondary blocks, paged data blocks, filtered elements, plus an
    HDF5-default-cparams variable and a v1-B-tree twin for
    tile-identity assertions (VERDICT r5 item 4)."""
    bld = _Builder(1 << 18)
    out: dict[str, np.ndarray] = {}
    links = []

    def add(name, oh, arr):
        out[name] = arr
        links.append((name, oh))

    def mk(nt, w):  # deterministic (nt, w) int32 payload
        return ((np.arange(nt * w, dtype="<i4").reshape(nt, w) * 13 + 7)
                % 2011)

    # 2 chunks -> both inline in the index block (iblk_elmts=2)
    a = mk(2, 5)
    add("ea_iblock", _dataset_v4_chunked(
        bld, a, (1, 5), "i4", 4, ea_params=EA_SMALL, unlim=True), a)
    # 5 chunks -> 2 inline + super blocks 0 (1x2) and 1 (1x4, partial),
    # both addressed from the index block's direct slots (smin=2 -> 2)
    b = mk(5, 4)
    add("ea_direct", _dataset_v4_chunked(
        bld, b, (1, 4), "i4", 4, ea_params=EA_SMALL, unlim=True), b)
    # 26 chunks -> spills into EASB super blocks 2 (2x4) and 3 (2x8,
    # paged: dblk 8 elems > 2^pbits=4 -> 2 pages per data block)
    c = mk(26, 5)
    add("ea_paged", _dataset_v4_chunked(
        bld, c, (1, 5), "i4", 4, ea_params=EA_SMALL, unlim=True), c)
    # same shape, deflate filter -> client-1 (addr,size,mask) elements
    add("ea_deflate", _dataset_v4_chunked(
        bld, c, (1, 5), "i4", 4, deflate=True, ea_params=EA_SMALL,
        unlim=True), c)
    # HDF5 library default creation params (the real-file shape):
    # 40 chunks -> 4 inline + s0 (1x16) + s1 (1x32 partial), all direct
    d = mk(40, 8)
    add("ea_default", _dataset_v4_chunked(
        bld, d, (1, 8), "i4", 4, ea_params=EA_DEFAULT, unlim=True), d)
    add("twin", _chunked_dataset(bld, c, (1, 5), "i4", True, []), c)
    root = _symbol_table_root(bld, links)
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return out


def build_btree2_file(path: str) -> dict[str, np.ndarray]:
    """v2 B-tree chunk indexes (the 2+-unlimited-dims shape, HDF5 1.10
    libver='latest'): depth-0 unfiltered, depth-0 filtered (type-11
    records with variable-width chunk sizes), a depth-1 tree (small
    node size forces BTIN root + separator records + multiple leaves),
    its filtered twin, and a v1-B-tree twin for tile-identity
    assertions (closes the last v4 chunk-index type)."""
    bld = _Builder(1 << 17)
    out: dict[str, np.ndarray] = {}
    links = []

    def add(name, oh, arr):
        out[name] = arr
        links.append((name, oh))

    big = ((np.arange(12 * 10, dtype="<i4").reshape(12, 10) * 19 + 3)
           % 1777)
    add("bt2_leaf", _dataset_v4_chunked(
        bld, big, (4, 4), "i4", 5, unlim=True), big)
    add("bt2_leaf_deflate", _dataset_v4_chunked(
        bld, big, (4, 4), "i4", 5, deflate=True, unlim=True), big)
    # 9 records, node_size 128 -> leaf cap 4 (rrec 24), BTIN root
    add("bt2_deep", _dataset_v4_chunked(
        bld, big, (4, 4), "i4", 5, bt2_node_size=128, elem_dim=False,
        unlim=True), big)
    # filtered deep: rrec 8+size_len(1)+4+16 = 29, cap 4 at 128
    add("bt2_deep_deflate", _dataset_v4_chunked(
        bld, big, (4, 4), "i4", 5, deflate=True, bt2_node_size=128,
        unlim=True), big)
    add("twin", _chunked_dataset(bld, big, (4, 4), "i4", True, []), big)
    root = _symbol_table_root(bld, links)
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return out


def _shuffle_bytes(raw: bytes, esize: int) -> bytes:
    """HDF5 shuffle filter forward direction (byte-plane transpose)."""
    n = len(raw) // esize
    return (
        np.frombuffer(raw, dtype=np.uint8).reshape(n, esize).T.tobytes()
    )


def build_big_nc4(
    path: str, side: int = 8192, chunk: int = 256, shuffle: bool = True
) -> int:
    """Many-chunk deflate(+shuffle) HDF5 file for ingest-at-scale
    benches (VERDICT r4 item 7): one (side, side) int32 'data' variable,
    (chunk, chunk) chunks, v1 B-tree index. Streams chunk-by-chunk (the
    full array is never materialized) and returns the chunk count."""
    import os as _os

    nchunks_side = (side + chunk - 1) // chunk
    entries = []
    with open(path, "wb") as f:
        # reserve the metadata region; chunks append after it
        meta_reserve = 4096 + 64 * nchunks_side * nchunks_side + 65536
        f.write(b"\x00" * meta_reserve)
        for cy in range(nchunks_side):
            base = (
                np.arange(chunk * chunk, dtype="<i4").reshape(chunk, chunk)
                + cy * 7
            )
            for cx in range(nchunks_side):
                raw = ((base + cx * 13) % 100000).tobytes()
                if shuffle:
                    raw = _shuffle_bytes(raw, 4)
                raw = zlib.compress(raw, 1)
                addr = f.tell()
                f.write(raw)
                entries.append(((cy * chunk, cx * chunk), addr, len(raw)))
        eof = f.tell()
    # metadata (B-tree leaves chained flat into one leaf is fine for the
    # reader: it walks entries of a single node) — build in a small
    # builder buffer and splice into the reserved region
    bld = _Builder(meta_reserve)
    bld.cursor = 4096
    bt = bytearray(
        b"TREE" + struct.pack("<BBH", 1, 0, len(entries)) + UNDEF8 + UNDEF8
    )
    for offs, addr, size in entries:
        bt += struct.pack("<II", size, 0)
        bt += b"".join(struct.pack("<Q", o) for o in offs) + struct.pack("<Q", 0)
        bt += struct.pack("<Q", addr)
    bt += struct.pack("<II", 0, 0) + b"\x00" * 24
    bt_addr = bld.alloc(bytes(bt))
    filters = struct.pack("<BB6x", 1, 2 if shuffle else 1)
    if shuffle:
        # shuffle (id 2, client value = element size), then deflate
        filters += struct.pack("<HHHH", 2, 0, 1, 1) + struct.pack("<I", 4) + b"\x00" * 4
    filters += struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack("<I", 1) + b"\x00" * 4
    msgs = [
        (0x0001, _dataspace_v1([side, side])),
        (0x0003, _datatype("i4")),
        (
            0x0008,
            struct.pack("<BBB", 3, 2, 3)
            + struct.pack("<Q", bt_addr)
            + struct.pack("<II", chunk, chunk)
            + struct.pack("<I", 4),
        ),
        (0x000B, filters),
    ]
    v_oh = bld.alloc(_v1_header(msgs))
    root = _symbol_table_root(bld, [("data", v_oh)])
    meta = bld.bytes()[:meta_reserve]
    meta = _superblock_v0(root, eof) + meta[len(_superblock_v0(root, eof)) :]
    with open(path, "r+b") as f:
        f.write(meta)
    _os.truncate(path, eof)
    return len(entries)


def _attr_v3(name: str, value: int) -> bytes:
    """Version-3 attribute message (what dense storage holds in the
    fractal heap): i4 scalar, no name padding."""
    nm = name.encode() + b"\x00"
    dt = _datatype("i4")
    ds = struct.pack("<BBB5x", 1, 0, 0)  # scalar
    out = struct.pack("<BBHHHB", 3, 0, len(nm), len(dt), len(ds), 0)
    return out + nm + dt + ds + struct.pack("<i", value)


def build_dense_attrs_file(path: str, n_attrs: int = 40,
                           node_size: int = 128) -> dict[str, int]:
    """Root group whose attributes live in dense storage (fractal heap
    + type-8 v2 name B-tree).  With the default tiny node size the
    name index overflows one leaf and the builder emits a DEPTH-1 tree
    (BTIN root + separator records) — the structure HDF5 writes for
    very large attribute sets, which the reader walks with the shared
    capacity/width math.  Returns {name: value}."""
    bld = _Builder(1 << 18)
    OFFB, LENB = 2, 2
    hid_len = 1 + OFFB + LENB
    want = {f"attr{i:03d}": i * 7 - 3 for i in range(n_attrs)}
    db = bytearray(b"FHDB" + struct.pack("<B", 0) + b"\x00" * 8
                   + b"\x00" * OFFB)
    recs = []
    for nm, val in want.items():
        msg = _attr_v3(nm, val)
        heap_id = (b"\x00" + struct.pack("<H", len(db))
                   + struct.pack("<H", len(msg)))
        db += msg
        # type-8 record: heap id + message flags(1) + corder(4) + hash(4)
        recs.append(heap_id + b"\x00" + struct.pack("<I", 0)
                    + struct.pack("<I", 0))
    start_bs = 4096
    assert len(db) <= start_bs, "fixture heap overflows one direct block"
    db += b"\x00" * (start_bs - len(db))
    db_addr = bld.alloc(bytes(db))
    frhp = bytearray(142)
    frhp[0:4] = b"FRHP"
    frhp[5:7] = struct.pack("<H", hid_len)
    frhp[110:112] = struct.pack("<H", 4)
    frhp[112:120] = struct.pack("<Q", start_bs)
    frhp[120:128] = struct.pack("<Q", start_bs)
    frhp[128:130] = struct.pack("<H", 16)
    frhp[130:132] = struct.pack("<H", 1)
    frhp[132:140] = struct.pack("<Q", db_addr)
    frhp_addr = bld.alloc(bytes(frhp))
    rec_size = hid_len + 9
    bthd_addr = _btree_v2_index(bld, recs, rec_size, 8, node_size)
    ai = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    root = bld.alloc(_v1_header([(0x0015, ai)]))
    data = bld.bytes()
    bld.place(0, _superblock_v0(root, len(data)))
    with open(path, "wb") as f:
        f.write(bld.bytes())
    return want
