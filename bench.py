"""Headline benchmark — one JSON line for the driver.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints:
{"metric": ..., "value": <total_sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "throughput": {...}}

Execution is forced with the noop sink (full computation, no driver
collect). First timing loop run is a JVM/Arrow warmup and is discarded.

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
tools/bench_scaling.py, which writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    # one per operator family; the full query matrix runs in the
    # correctness gate, not the perf loop
    "cell_assign",
    "pip_join",
    "zonal_stats",
    "tile_zonal_stats",
    "tile_classify_histogram",
    "warp_3857",
    "vectorize",
    "knn_join_cells",
    "dedup_exact",
    "similarity_topk",
    "text_stats",
    "corpus_clean",  # r6: webtext cleaning-stack throughput
    "salted_agg",
]


def _warp_3857(spark, sf_dir):
    """Round-comparable probe: the single nearest 4326→3857 warp (the r4
    registry row `warp_nearest` runs two warps — keeping this probe
    narrow preserves the BENCH_r* time series)."""
    import __spark_entry__ as e
    from trefoil_spark.raster.synth import synthetic_tiles
    from trefoil_spark.raster.warp import warp_tiles

    tiles = synthetic_tiles(spark, e.SPEC)
    return e._reduce_warp_sum_count(warp_tiles(spark, tiles, e.SPEC, e._DST_SPEC))


def _knn_join_cells(spark, sf_dir):
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    from trefoil_spark.operators.knn import knn_join_cells

    pages = e._pages(spark, sf_dir).select("doc_id", "lon", "lat")
    queries = pages.filter(F.col("doc_id") % 100 == 0)
    out = knn_join_cells(pages, queries, k=5, res=6, ring=1)
    return out.withColumn("rank", F.col("rank").cast("bigint")).orderBy(
        "query_id", "rank"
    )


def _similarity_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from trefoil_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    return (
        cosine_topk(emb, queries, k=5)
        .withColumn("rank", F.col("rank").cast("bigint"))
        .orderBy("query_id", "rank")
    )


def _corpus_clean(spark, sf_dir):
    """Webtext cleaning-stack throughput (r6, new row — cross-round
    suite totals before r6 lack it; compare per-query): deterministic
    $SPARK_GRAFT_CLEAN_FACTOR x expansion of the documents table
    (default 20 → 100k docs at sf0.1), reshaped into terminal-
    punctuated 10-word lines (the synthetic corpus is single-line
    unpunctuated, which C4 would drop wholesale), then C4 line/page
    rules + PII scrub (narrow codegen) + corpus-wide exact line dedup
    (digest shuffle over heavily-duplicated copies — the crawl shape)."""
    from pyspark.sql import functions as F

    from trefoil_spark.operators.cleaning import (
        c4_clean,
        dedup_paragraphs,
        redact_pii_col,
    )

    factor = int(os.environ.get("SPARK_GRAFT_CLEAN_FACTOR", "20"))
    # the sf0.1 documents table is ONE small parquet file = one input
    # partition; without this the whole narrow cleaning chain runs on
    # a single core (a bench-shape artifact — real corpora arrive in
    # thousands of splits)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    lined = F.concat(
        F.regexp_replace("text", r"((\S+ ){9}\S+) ", "$1.\n"), F.lit(".")
    )
    expanded = docs.select(
        "doc_id", lined.alias("text"),
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_c"),
    ).select(
        (F.col("doc_id") * factor + F.col("_c")).alias("doc_id"), "text"
    )
    cleaned = c4_clean(expanded).withColumn("text", redact_pii_col("text"))
    deduped = dedup_paragraphs(cleaned, split_pat=r"\n+", join_sep="\n")
    return deduped.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )


_LOCAL = {
    "warp_3857": _warp_3857,
    "knn_join_cells": _knn_join_cells,
    "similarity_topk": _similarity_topk,
    "corpus_clean": _corpus_clean,
}


def headline_queries():
    """name -> callable(spark, sf_dir) for the benchmark suite."""
    import __spark_entry__ as e

    qs = e.queries()
    out = {k: (qs[k] if k in qs else _LOCAL[k]) for k in HEADLINE}
    out["zonal_scaled"] = _zonal_scaled
    return out


def _zonal_scaled(spark, sf_dir):
    """Throughput probe at meaningful scale: the flagship zonal pipeline
    over a deterministic in-memory expansion of the pages table
    ($SPARK_GRAFT_BENCH_FACTOR x documents; default 400 → 2M rows at sf0.1)."""
    from pyspark.sql import functions as F

    from trefoil_spark.operators.pip_join import pip_join
    from trefoil_spark.operators.zonal import zonal_statistics
    from trefoil_spark.sources.pages import build_pages_scaled
    from trefoil_spark.sources.zones import ZONE_LAYER

    factor = int(os.environ.get("SPARK_GRAFT_BENCH_FACTOR", "400"))
    pages = build_pages_scaled(spark, sf_dir, factor)
    slim = pages.select("lat", "lon", F.length("text").alias("n_chars"))
    return zonal_statistics(pip_join(slim, ZONE_LAYER), "zone_value", "n_chars")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _wait_for_idle(threshold: float, max_wait_sec: float) -> float:
    """Spin-wait until the 1-min load average drops below `threshold`
    (or `max_wait_sec` elapses), so the recorded suite number isn't
    polluted by a co-tenant burst.  Returns the load at release."""
    deadline = time.monotonic() + max_wait_sec
    load = os.getloadavg()[0]
    while load > threshold and time.monotonic() < deadline:
        time.sleep(10.0)
        load = os.getloadavg()[0]
    return load


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — co-tenant-VM theft is
    invisible to loadavg but shows up as steal time.  Round-5 finding:
    identical code oscillated 2.2 s ↔ 34 s on this box with constant
    JVM/py RSS, constant shuffle-file counts and near-idle loadavg; the
    only external signal was nonzero %steal, so the bench gates on it."""
    try:
        with open("/proc/stat") as f:
            p = f.readline().split()
        vals = [int(x) for x in p[1:9]]
        return vals[7], sum(vals)
    except (OSError, IndexError, ValueError):
        return 0, 0


_BW_BUFS = None


def _bandwidth_probe(iters: int = 12, mib: int = 64) -> float:
    """STREAM-style add kernel (a = b + c over 64 MiB float64 buffers,
    far above L3): achieved single-thread GB/s, median of `iters` after
    two discarded fault-in/warmup iterations.  Steal sampling catches
    co-tenant CPU theft but NOT memory-bus drag — the one mechanism left
    unmeasured in the r5 zonal-family drift (VERDICT r5 item 3).
    Probing at every pass boundary lets a record be machine-flagged when
    the bus was slower than the session's best.  Buffers are cached so
    repeated probes measure bandwidth, not page-fault latency (first
    fault-in was observed at 15 s under co-tenant memory pressure)."""
    import numpy as np

    global _BW_BUFS
    n = mib * 1024 * 1024 // 8
    if _BW_BUFS is None:
        _BW_BUFS = (np.full(n, 1.5), np.full(n, 2.5), np.empty(n))
    b, c, a = _BW_BUFS
    times = []
    for i in range(iters + 2):
        t0 = time.perf_counter()
        np.add(b, c, out=a)
        dt = time.perf_counter() - t0
        if i >= 2:  # discard fault-in / cache-state warmup
            times.append(dt)
    # STREAM convention: 3 array transfers per add iteration
    return 3 * 8 * n / (sorted(times)[len(times) // 2] * 1e9)


def _paeth_png(img) -> bytes:
    """Forward-Paeth-filtered truecolor PNG (filter byte 4 on every
    scanline) — the engine's encoder emits filter 0 only, so the decode
    worst case (the r5 'PNG (Paeth-filtered)' row) needs this foreign
    construction.  Filters reference the UNFILTERED previous scanline
    per the PNG spec."""
    import zlib

    import numpy as np

    from trefoil_spark.functions.png import _chunk

    h, w, _ = img.shape
    stride = 3 * w
    raw = img.reshape(h, stride).astype(np.int16)
    zero3 = np.zeros(3, dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    rows = bytearray()
    for r in range(h):
        cur = raw[r]
        left = np.concatenate([zero3, cur[:-3]])
        ul = np.concatenate([zero3, prev[:-3]])
        p = left + prev - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
        )
        rows.append(4)
        rows += ((cur - pred) % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _chunk(b"IEND", b"")
    )


def _codec_tiles() -> dict[str, bytes]:
    """Deterministic worst-case decode payloads, one per own codec:
    a dense uniform-noise 256² RGB tile (JPEG/PNG/WebP/BMP/ICO), its
    256-color palette-noise twin (GIF is palette-bound by format), and
    a 65536-sample noise waveform (FLAC/ADPCM — the audio work unit
    matching one tile's sample count)."""
    import numpy as np

    from trefoil_spark.functions.avi import encode_avi_mjpeg
    from trefoil_spark.functions.bmp import encode_bmp_rle8, encode_ico
    from trefoil_spark.functions.flac import encode_flac
    from trefoil_spark.functions.gif import encode_gif
    from trefoil_spark.functions.jpeg import encode_jpeg
    from trefoil_spark.functions.png import encode_rgb_png
    from trefoil_spark.functions.vp8 import encode_webp_lossy
    from trefoil_spark.functions.wav import encode_wav_ima_adpcm
    from trefoil_spark.functions.webp import encode_webp

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    pal = np.unique(rng.integers(0, 256, (256, 3), dtype=np.uint8), axis=0)
    pidx = rng.integers(0, len(pal), (256, 256)).astype(np.uint8)
    pimg = pal[pidx]
    wave = rng.integers(-32768, 32768, 65536).astype(np.int16)
    return {
        "jpeg_baseline": encode_jpeg(img, 90),
        "jpeg_progressive": encode_jpeg(img, 90, progressive=True),
        "png_filter0": encode_rgb_png(img),
        "png_paeth": _paeth_png(img),
        "webp_vp8l": encode_webp(img),
        "webp_vp8": encode_webp_lossy(img, qi=40),  # coefficient-dense lossy
        "gif": encode_gif(pimg),
        "bmp_rle8": encode_bmp_rle8(pidx, pal),  # noise = worst RLE case
        "ico": encode_ico(img),
        "flac": encode_flac(wave, 16000),
        "wav_adpcm_ima": encode_wav_ima_adpcm(wave, 16000),
        # video: 4 noise frames of 128² = one 256² tile's pixel count,
        # so the row shares the suite's per-tile unit
        "avi_mjpeg": encode_avi_mjpeg(
            [
                rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
                for _ in range(4)
            ],
            fps=10,
            quality=90,
        ),
        # animated formats (r6): 4×128² frames = one tile of pixels,
        # full dispose/blend compositing walk included in the cost
        "apng": _apng_tile(rng),
        "webp_anim": _webp_anim_tile(rng),
        "avi_rle8": _avi_rle8_tile(rng, pal),
        # vector: 100 random polygons rasterized onto a 256² canvas
        "svg": _svg_tile(rng),
    }


def _svg_tile(rng):
    import numpy as np

    parts = ['<svg xmlns="http://www.w3.org/2000/svg" '
             'width="256" height="256">']
    for _ in range(100):
        n = int(rng.integers(3, 8))
        cx, cy = rng.uniform(20, 236, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(5, 20, n)
        pts = " ".join(
            f"{cx + r * np.cos(a):.2f},{cy + r * np.sin(a):.2f}"
            for r, a in zip(rad, ang)
        )
        color = "#{:02x}{:02x}{:02x}".format(*rng.integers(0, 256, 3))
        parts.append(f'<polygon points="{pts}" fill="{color}"/>')
    parts.append("</svg>")
    return "".join(parts).encode()


def _apng_tile(rng):
    import numpy as np

    from trefoil_spark.functions.png import encode_apng

    return encode_apng(
        [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
         for _ in range(4)]
    )


def _webp_anim_tile(rng):
    import numpy as np

    from trefoil_spark.functions.webp import encode_webp_anim

    return encode_webp_anim(
        [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
         for _ in range(4)]
    )


def _avi_rle8_tile(rng, pal):
    from trefoil_spark.functions.avi import encode_avi_rle8

    return encode_avi_rle8(
        [rng.integers(0, len(pal), (128, 128)).astype("uint8")
         for _ in range(4)],
        pal,
    )


def _codec_decode_bench(runs: int, steal_max: float) -> dict[str, float]:
    """Per-format decode seconds per 256² tile, min-of-`runs`,
    steal-gated like the suite (VERDICT r5 item 7: regressions in the
    pure-Python decoders must show in the driver's cross-round diff,
    not only in prose)."""
    from trefoil_spark.functions.avi import decode_avi
    from trefoil_spark.functions.bmp import decode_bmp, decode_ico
    from trefoil_spark.functions.flac import decode_flac
    from trefoil_spark.functions.gif import decode_gif
    from trefoil_spark.functions.jpeg import decode_jpeg
    from trefoil_spark.functions.png import decode_png, decode_rgb_png
    from trefoil_spark.functions.wav import decode_wav
    from trefoil_spark.functions.webp import decode_webp

    decoders = {
        "jpeg_baseline": decode_jpeg,
        "jpeg_progressive": decode_jpeg,
        "png_filter0": decode_rgb_png,
        "png_paeth": decode_png,
        "webp_vp8l": decode_webp,
        "webp_vp8": decode_webp,
        "gif": decode_gif,
        "bmp_rle8": decode_bmp,
        "ico": decode_ico,
        "flac": decode_flac,
        "wav_adpcm_ima": decode_wav,
        "avi_mjpeg": decode_avi,
        "apng": __import__(
            "trefoil_spark.functions.png", fromlist=["decode_apng_frames"]
        ).decode_apng_frames,
        "webp_anim": __import__(
            "trefoil_spark.functions.webp", fromlist=["decode_webp_frames"]
        ).decode_webp_frames,
        "avi_rle8": decode_avi,
        "svg": __import__(
            "trefoil_spark.functions.svg", fromlist=["decode_svg"]
        ).decode_svg,
    }
    tiles = _codec_tiles()
    out = {}
    for name, payload in tiles.items():
        dec = decoders[name]
        dec(payload)  # warmup (allocator, LUT builds)
        samples = []

        def one():
            s0, t0j = _cpu_ticks()
            t0 = time.perf_counter()
            dec(payload)
            wall = time.perf_counter() - t0
            s1, t1j = _cpu_ticks()
            dt = t1j - t0j
            samples.append(
                (wall, (100.0 * (s1 - s0) / dt) if dt > 0 else 0.0)
            )

        for _ in range(runs):
            one()
        extra = 0
        while all(st > steal_max for _, st in samples) and extra < 2:
            one()
            extra += 1
        clean = [w for w, st in samples if st <= steal_max] or [
            w for w, _ in samples
        ]
        out[name] = round(min(clean), 4)
    return out


def _timed_force(fn, spark, sf_dir) -> tuple[float, float]:
    """Run one query; returns (wall_sec, steal_pct during the run)."""
    s0, t0j = _cpu_ticks()
    t0 = time.perf_counter()
    force(fn(spark, sf_dir))
    wall = time.perf_counter() - t0
    s1, t1j = _cpu_ticks()
    dt = t1j - t0j
    return wall, (100.0 * (s1 - s0) / dt) if dt > 0 else 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Box-load guard (VERDICT r4 #1): a loaded box made BENCH_r04 read as a
    # +22% regression that idle replicates disproved.  Wait (bounded) for an
    # idle-ish box, record load before/after, and report min-of-N (the
    # least-interfered run) instead of median.
    load_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "4.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "300"))
    load_at_start = _wait_for_idle(load_threshold, max_wait)

    from trefoil_spark.session import get_spark

    spark = get_spark(
        app_name="trefoil_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = headline_queries()
    # warmup (discarded): JVM JIT + Python worker pool spin-up
    for fn in qs.values():
        force(fn(spark, sf_dir))

    steal_max = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "3.0"))

    def _suite_attempt() -> dict:
        """One full interleaved measurement window (N round-robin
        passes, min-of-N per query, per-query steal retries, bandwidth
        probes at pass boundaries)."""
        bw_probes: list[float] = [_bandwidth_probe()]
        per_run_loads: list[float] = []
        samples: dict[str, list[tuple[float, float]]] = {n: [] for n in qs}
        # N interleaved round-robin passes (not N consecutive runs per
        # query): co-tenant bursts last minutes, so consecutive runs of
        # one query all land inside the same burst — interleaving
        # spreads each query's runs across the suite's full wall span.
        # Per-query result is min-of-N (no warm/cold asymmetry after
        # the discarded warmup loop).  Runs whose fastest sample saw
        # >steal_max %steal are retried (bounded) at the end.
        for _ in range(runs):
            for name, fn in qs.items():
                samples[name].append(_timed_force(fn, spark, sf_dir))
                per_run_loads.append(os.getloadavg()[0])
            bw_probes.append(_bandwidth_probe())

        def _kept(s: list[tuple[float, float]]) -> tuple[float, float]:
            return min(s, key=lambda ws: ws[0])

        retried = 0
        for name, fn in qs.items():
            attempts = 0
            while _kept(samples[name])[1] > steal_max and attempts < 2:
                samples[name].append(_timed_force(fn, spark, sf_dir))
                attempts += 1
                retried += 1
        timings = {n: _kept(s)[0] for n, s in samples.items()}
        kept_steal = {n: _kept(s)[1] for n, s in samples.items()}
        best_bw, worst_bw = max(bw_probes), min(bw_probes)
        return {
            "timings": timings,
            "kept_steal": kept_steal,
            "polluted": sorted(
                n for n, st in kept_steal.items() if st > steal_max
            ),
            "per_run_loads": per_run_loads,
            "bw_probes": bw_probes,
            "retried": retried,
            "bw_flagged": bool(worst_bw < 0.9 * best_bw),
            "steal_flagged": bool(max(kept_steal.values()) > steal_max),
        }

    # Self-certifying window (r7, VERDICT r6 item 2): the r6 official
    # record was captured in a window the bench's OWN gates flag
    # (bandwidth drop 13.1% > 10%, steal 2.08%) while a clean window
    # measured 22% faster on identical code.  Retry the whole suite
    # (bounded) until a window passes BOTH gates; if none does, emit
    # the best attempt explicitly marked polluted so the cross-round
    # diff is machine-interpretable either way.
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    retry_sleep = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_SLEEP", "30"))
    attempts: list[dict] = []
    for i in range(max_attempts):
        att = _suite_attempt()
        attempts.append(att)
        if not att["bw_flagged"] and not att["steal_flagged"]:
            break
        if i + 1 < max_attempts:
            time.sleep(retry_sleep)
    best = min(
        attempts,
        key=lambda a: (
            a["bw_flagged"] or a["steal_flagged"],
            sum(a["timings"].values()),
        ),
    )
    window_clean = not (best["bw_flagged"] or best["steal_flagged"])
    timings = best["timings"]
    kept_steal = best["kept_steal"]
    polluted = best["polluted"]
    per_run_loads = best["per_run_loads"]
    bw_probes = best["bw_probes"]
    retried = best["retried"]

    # throughput on the flagship join+agg pipeline at meaningful scale
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    factor = int(os.environ.get("SPARK_GRAFT_BENCH_FACTOR", "400"))
    scaled_rows = n_docs * factor
    scaled_t = timings.get("zonal_scaled")
    out = {
        "metric": "headline suite wall time (sf dir), min of %d" % runs,
        "window_quality": "clean" if window_clean else "polluted",
        "window_attempts": len(attempts),
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": sf_dir,
        "cpus": int(cpus),
        "load": {
            "at_start": round(load_at_start, 2),
            "during_max": round(max(per_run_loads), 2) if per_run_loads else None,
            "at_end": round(os.getloadavg()[0], 2),
            "threshold": load_threshold,
        },
        "steal": {
            "kept_run_max_pct": round(max(kept_steal.values()), 2),
            "polluted_queries": polluted,
            "threshold_pct": steal_max,
            "retries": retried,
        },
        "throughput": {
            "zonal_pipeline_rows_per_sec": (
                round(scaled_rows / scaled_t, 1) if scaled_t else None
            ),
            "zonal_pipeline_input_rows": scaled_rows,
            "docs_rows": n_docs,
        },
    }
    # memory-bandwidth co-probe (r6): pass-boundary STREAM-add GB/s.
    # NOTE: during_max load is the suite's OWN local[32] work, not
    # pollution (r5 finding #3) — pollution is what steal/bandwidth flag.
    best_bw = max(bw_probes)
    worst_bw = min(bw_probes)
    out["bandwidth"] = {
        "probe_gbps": [round(x, 2) for x in bw_probes],
        "best_gbps": round(best_bw, 2),
        "worst_gbps": round(worst_bw, 2),
        "max_drop_pct": round(100.0 * (1 - worst_bw / best_bw), 1),
        "flagged": bool(worst_bw < 0.9 * best_bw),
    }
    # per-codec decode floor (r6): pure single-core Python decoders —
    # regressions here must surface in the driver's cross-round diff
    out["codec_decode"] = _codec_decode_bench(
        runs=max(3, runs), steal_max=steal_max
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
