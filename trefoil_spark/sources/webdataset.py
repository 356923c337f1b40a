"""WebDataset-style tar shard reader/writer — the de-facto shard
format for multimodal training data (images + sidecar text/metadata
grouped by key inside plain .tar files, sharded into thousands of
archives).

Layout (public: POSIX ustar + the WebDataset convention): a shard is
an ordinary tar; files `abc123.jpg`, `abc123.txt`, `abc123.json`
sharing the basename form ONE sample with fields keyed by extension.
Shards — not files — are the unit of parallelism: a loader (or here, a
Spark task) consumes whole shards sequentially, which is what makes
the format object-store friendly (pure sequential reads, no index).

Own tar parser: 512-byte headers, octal size fields, data padded to
512; ustar prefix field honored; GNU long-name ('L') entries handled.
PAX headers are skipped (size honored) — enough for every shard the
standard writers emit.

The 100 TB story mirrors warc.py: `spark.read.format("binaryFile")`
keeps one task per shard, samples stream through a generator, memory
stays O(largest member). At real scale the shard list is just bigger;
nothing on the driver grows with data size.
"""

from __future__ import annotations

import io
import posixpath
import tarfile

__all__ = [
    "iter_tar_members", "group_samples", "write_tar_shard",
    "webdataset_to_samples",
]


def iter_tar_members(data: bytes):
    """tar bytes → yield (name, payload bytes) per regular file."""
    pos = 0
    n = len(data)
    longname = None
    while pos + 512 <= n:
        hdr = data[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break  # end-of-archive marker
        name = hdr[:100].split(b"\x00")[0].decode("utf-8", "replace")
        size_field = hdr[124:136].split(b"\x00")[0].strip()
        size = int(size_field or b"0", 8)
        typeflag = hdr[156:157]
        if hdr[257:262] == b"ustar":
            prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
            if prefix:
                name = prefix + "/" + name
        payload = data[pos + 512 : pos + 512 + size]
        pos += 512 + (size + 511) // 512 * 512
        if typeflag == b"L":  # GNU long name: payload is the real name
            longname = payload.rstrip(b"\x00").decode("utf-8", "replace")
            continue
        if longname is not None:
            name = longname
            longname = None
        if typeflag in (b"0", b"\x00"):  # regular file
            yield name, payload
        # directories / PAX ('x'/'g') / links: skipped, size honored


def group_samples(members) -> dict:
    """(name, bytes) stream → {key: {ext: bytes}} per the WebDataset
    convention: key = path without the LAST extension, so
    'a/b.c.jpg' → key 'a/b.c', field 'jpg'."""
    samples: dict = {}
    for name, payload in members:
        base = posixpath.basename(name)
        if "." not in base:
            key, ext = name, ""
        else:
            key, _dot, ext = name.rpartition(".")
        samples.setdefault(key, {})[ext] = payload
    return samples


def write_tar_shard(samples: dict) -> bytes:
    """Twin writer: {key: {ext: bytes}} → tar shard bytes (ustar,
    deterministic member order and zeroed timestamps so shards are
    byte-stable)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key in sorted(samples):
            for ext in sorted(samples[key]):
                name = f"{key}.{ext}" if ext else key
                info = tarfile.TarInfo(name=name)
                payload = samples[key][ext]
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def webdataset_to_samples(spark, paths, fields=("jpg", "txt")):
    """Tar shard paths → DataFrame(key, shard, <field> binary...) —
    one Spark task per shard, samples grouped by basename key. Missing
    fields are null; extra members are ignored. Field columns are raw
    binary — decode is a separate stage (operators/multimodal.py), so
    this scan stays cheap."""
    import pandas as pd

    if isinstance(paths, str):
        paths = [paths]
    files = spark.read.format("binaryFile").load(paths).select(
        "path", "content"
    )
    fields = list(fields)

    def gen(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                samples = group_samples(iter_tar_members(bytes(content)))
                for key in sorted(samples):
                    fv = samples[key]
                    rows.append(
                        [key, path] + [fv.get(f) for f in fields]
                    )
            yield pd.DataFrame(
                rows, columns=["key", "shard"] + fields
            )

    schema = "key string, shard string, " + ", ".join(
        f"{f} binary" for f in fields
    )
    return files.mapInPandas(gen, schema=schema)
