"""Property tests for the cleaning twins: random adversarial documents
must produce STRING-EQUAL results from the Catalyst expressions and
their DuckDB twins (the dialect-parity claim, not just the five
hand-picked fixtures)."""

import random

import duckdb
import pandas as pd

from trefoil_spark.operators.cleaning import (
    c4_clean_col,
    c4_page_pass_col,
    c4_sql_duckdb,
    pii_sql_duckdb,
    redact_pii_col,
)

_WORDS = ["alpha", "beta", "Lorem", "ipsum", "javascript", "x", "tag",
          "word", "p{}q", "end.", "stop!", "why?", 'quote"', "no-dot",
          "a.b", "...", "-", "*", "42", "bob@x.io", "10.0.0.1",
          "+44 20 7946 0958", "555-0199-8877"]
_SEPS = [" ", "  ", "\t", "\n", "\n\n", " \n", "\t\n"]


def _random_doc(rng: random.Random) -> str:
    n = rng.randrange(0, 40)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(_WORDS))
        parts.append(rng.choice(_SEPS))
    return "".join(parts)


def test_c4_and_pii_twins_on_random_docs(spark):
    rng = random.Random(1234)
    docs = [_random_doc(rng) for _ in range(300)]
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}
    ))
    twins = c4_sql_duckdb()
    want = con.execute(
        f"SELECT doc_id, {twins['cleaned']} AS cleaned, "
        f"{twins['page_pass']} AS page_pass, "
        f"{pii_sql_duckdb()} AS red FROM docs ORDER BY doc_id"
    ).fetchdf()
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, text string"
    )
    got = df.select(
        "doc_id",
        c4_clean_col().alias("cleaned"),
        c4_page_pass_col().alias("page_pass"),
        redact_pii_col().alias("red"),
    ).orderBy("doc_id").toPandas()
    for col in ("cleaned", "page_pass", "red"):
        g, w = got[col].tolist(), want[col].tolist()
        bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
        assert not bad, (
            f"{col}: {len(bad)} mismatches, first doc "
            f"{bad[0]}: {docs[bad[0]]!r} -> spark {g[bad[0]]!r} "
            f"vs duckdb {w[bad[0]]!r}"
        )
