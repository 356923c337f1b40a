"""Sequence packing + domain capping (r6): exact python-oracle
equality across bucket boundaries, plan-shape guards (no global-order
window over the corpus), DuckDB twin for the domain cap."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from trefoil_spark.operators.seqpack import (
    EOS,
    cap_per_domain,
    domain_col,
    pack_sequences,
)


def _py_pack(docs, seq_len, drop_last=True):
    stream, bounds = [], []
    for _id, text in sorted(docs):
        toks = [t for t in text.split() if t] + [EOS]
        bounds.append((len(stream), len(stream) + len(toks)))
        stream.extend(toks)
    seqs = {}
    for s in range(0, len(stream), seq_len):
        chunk = stream[s:s + seq_len]
        if drop_last and len(chunk) < seq_len:
            continue
        n_docs = sum(1 for lo, hi in bounds if lo < s + len(chunk) and hi > s)
        seqs[s // seq_len] = (chunk, n_docs)
    return seqs


@pytest.mark.parametrize("bucket_size", [2, 3, 1000])
def test_pack_matches_python_oracle(spark, bucket_size):
    """Tiny bucket sizes force multi-bucket prefix math; the giant one
    collapses to a single bucket — all must agree with the oracle."""
    docs = [
        (0, "a b c"),
        (1, "d e f g h i j"),
        (3, "k"),            # gap in doc_id space: buckets not dense
        (4, "l m n o p q r s t u v w"),
        (9, "x y"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["seq_id"]: (list(r["tokens"]), r["n_docs"], r["n_tokens"])
        for r in pack_sequences(df, 5, bucket_size=bucket_size).collect()
    }
    want = _py_pack(docs, 5)
    assert sorted(got) == sorted(want)
    for sid, (chunk, n_docs) in want.items():
        assert got[sid][0] == chunk, f"seq {sid}"
        assert got[sid][1] == n_docs
        assert got[sid][2] == 5


def test_pack_keep_last(spark):
    docs = [(0, "a b c d e f g")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = pack_sequences(df, 5, drop_last=False).orderBy("seq_id").collect()
    assert [r["n_tokens"] for r in rows] == [5, 3]  # 7 toks + eos
    assert list(rows[1]["tokens"]) == ["f", "g", EOS]


def test_pack_no_global_window(spark):
    """The executed plan must not contain a window with an empty
    partition clause over the doc table — the whole point of the
    bucketed two-phase scan. Spark marks those single-partition sorts
    with a 'Window' whose partition spec is empty; we assert every
    Window node is partitioned."""
    df = spark.createDataFrame(
        [(i, "w " * 8) for i in range(64)], "doc_id bigint, text string"
    )
    plan = pack_sequences(df, 16)._jdf.queryExecution().executedPlan(
    ).toString()
    windows = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    # r7: the bucket-prefix window is gone (offsets computed in the
    # driver from the bounded bucket aggregate); the ONE remaining
    # window is the per-doc running sum, partitioned by bucket
    assert len(windows) == 1
    for line in windows:
        assert "windowspecdefinition(bucket" in line, line


def test_pack_bucket_prefix_is_tiny(spark):
    """Bucket table cardinality == number of buckets, not docs: the
    unpartitioned prefix window only ever sees that."""
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id bigint, text string"
    )
    out = pack_sequences(df, 4, bucket_size=16)
    # 100 docs x 4 tokens = 400 tokens → exactly 100 sequences of 4
    assert out.count() == 100


DOMAIN_DOCS = [
    (0, "https://www.example.com/a", "t0"),
    (1, "https://www.example.com/b?q=1", "t1"),
    (2, "http://user:pw@www.example.com:8080/c", "t2"),
    (3, "https://other.org/", "t3"),
    (4, "https://WWW.EXAMPLE.COM/d", "t4"),
    (5, "ftp://other.org/f", "t5"),
]


def test_domain_col_matches_duckdb(spark):
    sql = (
        "lower(regexp_extract(url, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1))"
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(
        [(d, u) for d, u, _ in DOMAIN_DOCS], columns=["doc_id", "url"]
    ))
    want = con.execute(
        f"SELECT {sql} AS dom FROM docs ORDER BY doc_id"
    ).fetchdf()["dom"].tolist()
    df = spark.createDataFrame(DOMAIN_DOCS, "doc_id bigint, url string, text string")
    got = df.select(domain_col().alias("dom")).orderBy("doc_id")
    got = [r["dom"] for r in got.collect()]
    assert got == want
    assert got[0] == got[2] == got[4] == "www.example.com"


def test_cap_per_domain(spark):
    df = spark.createDataFrame(DOMAIN_DOCS, "doc_id bigint, url string, text string")
    kept = sorted(r["doc_id"] for r in cap_per_domain(df, 2).collect())
    # example.com keeps 0,1 (drops 2,4); other.org keeps 3,5
    assert kept == [0, 1, 3, 5]
    assert cap_per_domain(df, 2).columns == ["doc_id", "url", "text"]


def test_pack_sparse_63bit_ids_bounded_buckets(spark):
    """ADVICE r6 (medium): floor(id/bucket_size) bucketing degenerated
    to one bucket per doc on sparse hashed 63-bit ids (the WARC source
    shape) — a #docs-row prefix window and a #docs-row broadcast. The
    span-derived equal-width buckets must stay ~n/bucket_size and the
    pack must still match the python oracle."""
    import hashlib

    def hid(i):
        return int.from_bytes(
            hashlib.sha256(str(i).encode()).digest()[:8], "big") >> 1

    docs = [(hid(i), f"w{i}a w{i}b w{i}c") for i in range(64)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    from trefoil_spark.operators.seqpack import pack_sequences as _ps

    out = _ps(df, 4, bucket_size=16)
    got = {r["seq_id"]: (list(r["tokens"]), r["n_docs"])
           for r in out.collect()}
    want = _py_pack(docs, 4)
    assert {s: v[0] for s, v in got.items()} == {s: v[0] for s, v in want.items()}
    # bucket-table bound: the same expression pack_sequences uses must
    # land the 64 sparse ids in <= ceil(64/16)+1 buckets
    lo = min(d for d, _ in docs)
    hi = max(d for d, _ in docs)
    width = max(1, (hi - lo) // 4 + 1)
    n_buckets = df.select(
        F.expr(f"doc_id div {width}").alias("b")).distinct().count()
    assert n_buckets <= 5


def test_cap_per_domain_two_phase_exact_and_salted(spark):
    """One domain holds ~50%% of rows: the two-phase cap must (a) equal
    the single-phase result exactly, (b) rank phase 1 within
    (domain, salt) in the executed plan (no single-task mega-domain
    sort)."""
    rows = [(i, "https://mega.example/" + str(i), "t") for i in range(50)]
    rows += [(100 + i, f"https://site{i}.org/", "t") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    two = sorted(r["doc_id"] for r in cap_per_domain(df, 3).collect())
    one = sorted(r["doc_id"] for r in cap_per_domain(df, 3, salt=1).collect())
    assert two == one
    assert [d for d in two if d < 100] == [0, 1, 2]  # mega-domain capped
    plan = cap_per_domain(df, 3)._jdf.queryExecution().executedPlan().toString()
    wins = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert any("__salt" in l for l in wins), plan


def test_bucket_count_hard_cap(spark):
    """r8 (ADVICE r7): the driver-side prefix table is bounded by
    max_buckets regardless of corpus size, and results are unchanged
    when the cap binds (bucket boundaries never affect offsets)."""
    from trefoil_spark.operators.seqpack import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w%d a b c" % i) for i in range(200)],
        "doc_id bigint, text string",
    )
    uncapped = pack_sequences(docs, 7, bucket_size=1).collect()
    capped = pack_sequences(docs, 7, bucket_size=1, max_buckets=4).collect()
    key = lambda rows: sorted((r["seq_id"], tuple(r["tokens"])) for r in rows)
    assert key(uncapped) == key(capped)
