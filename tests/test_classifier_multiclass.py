"""Multiclass NB (lang-id shape): held-out prediction, unseen-token
backoff, and DuckDB full-matrix twin parity."""
import duckdb
import pytest
from pyspark.sql import functions as F

from trefoil_spark.operators.classifier import (
    nb_multiclass_sql_duckdb,
    predict_nb_multiclass,
    score_nb_multiclass,
    train_nb_multiclass,
)

VOCAB = {
    "en": "the quick brown fox jumps over a lazy dog near the river",
    "de": "der schnelle braune fuchs springt über den faulen hund am fluss",
    "fr": "le renard brun rapide saute par dessus le chien paresseux",
}


def _doc(lang, i):
    words = VOCAB[lang].split()
    # rotate so docs differ but stay in-language
    rot = words[i % len(words):] + words[:i % len(words)]
    return " ".join(rot)


@pytest.fixture(scope="module")
def corpora(spark):
    labeled = spark.createDataFrame(
        [(100 * k + i, lang, _doc(lang, i))
         for k, lang in enumerate(VOCAB) for i in range(6)],
        "doc_id bigint, lang string, text string",
    )
    docs = spark.createDataFrame(
        [(900, _doc("en", 7)), (901, _doc("de", 7)), (902, _doc("fr", 7)),
         (903, "zzz qqq unseen tokens entirely"), (904, "")],
        "doc_id bigint, text string",
    )
    return labeled, docs


def test_heldout_prediction(corpora):
    labeled, docs = corpora
    model, meta = train_nb_multiclass(labeled)
    scores = score_nb_multiclass(docs, model, meta)
    pred = {r["doc_id"]: r["label"]
            for r in predict_nb_multiclass(scores).collect()}
    assert pred[900] == "en" and pred[901] == "de" and pred[902] == "fr"
    # all-unseen and empty docs fall back to priors (equal here) +
    # per-label unseen mass; still produce a deterministic label
    assert pred[903] in VOCAB and pred[904] in VOCAB
    # full matrix: one score per (doc, label)
    assert scores.count() == 5 * 3


def test_duckdb_twin_parity(corpora, tmp_path):
    labeled, docs = corpora
    for name, df in (("labeled", labeled), ("docs", docs)):
        df.write.parquet(str(tmp_path / name))
    con = duckdb.connect()
    for name in ("labeled", "docs"):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{tmp_path / name}/*.parquet')"
        )
    oracle = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            "SELECT doc_id, label, "
            "CAST(ROUND(score * 100) AS BIGINT) FROM ("
            + nb_multiclass_sql_duckdb("labeled", "docs") + ")"
        ).fetchall()
    }
    model, meta = train_nb_multiclass(labeled)
    got = {
        (r["doc_id"], r["label"]): r["sc"]
        for r in score_nb_multiclass(docs, model, meta).select(
            "doc_id", "label",
            F.round(F.col("score") * 100).cast("bigint").alias("sc"),
        ).collect()
    }
    assert got == oracle
