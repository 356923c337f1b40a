"""Null/degenerate inputs through the r7 URL + dedup operators: nulls
must flow through as nulls (or group benignly), never crash a task or
silently drop unrelated rows."""
import datetime

from trefoil_spark.operators.dedup import dedup_latest
from trefoil_spark.operators.urlnorm import canonical_url_col


def test_canonical_url_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "http://a.com/x")],
        "doc_id bigint, url string",
    )
    got = {r["doc_id"]: r["c"]
           for r in df.select(
               "doc_id", canonical_url_col().alias("c")).collect()}
    assert got[0] is None          # null in, null out
    assert got[1] == ""            # unparseable stays as-is
    assert got[2] == "http://a.com/x"


def test_dedup_latest_null_key_and_ts(spark):
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (0, None, ts),
        (1, None, datetime.datetime(2026, 1, 2)),
        (2, "u", None),
        (3, "u", ts),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, url string, warc_ts timestamp"
    )
    kept = sorted(r["doc_id"] for r in dedup_latest(df).collect())
    # null urls form one group (newest = 1); null ts loses to any ts
    assert kept == [1, 3]
