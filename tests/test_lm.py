"""Bigram-LM perplexity scoring (r6): Spark vs a full DuckDB twin of
train + score (add-one smoothing, two-level backoff), plus semantics
(seen text scores better than noise; no-bigram docs get NULL)."""

import duckdb
import pandas as pd
import pytest

from trefoil_spark.operators.lm import score_perplexity, train_bigram_lm

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog met"),
]
SCORE_DOCS = [
    (10, "the cat sat on the mat"),          # fully in-domain
    (11, "the cat flew over uncharted seas"),  # unseen bigrams + words
    (12, "zzz"),                              # no bigram: NULL ppl
    (13, "qq ww ee"),                         # all-unseen words
]

_TWIN = """
WITH ctoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS t
  FROM corpus
), cbg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> {'w1': t[i], 'w2': t[i+1]})) AS s
  FROM ctoks WHERE len(t) >= 2
), bgf AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM cbg),
uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bgf GROUP BY w1),
vocab AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT unnest(t) AS w FROM ctoks)
),
model AS (
  SELECT w1, w2,
         ln((c12 + CAST(1 AS DOUBLE)) / CAST(c1 + v AS DOUBLE)) AS logp
  FROM (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bgf GROUP BY w1, w2)
  JOIN uni USING (w1) CROSS JOIN vocab
),
stoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS t
  FROM score_docs
), sbg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> {'w1': t[i], 'w2': t[i+1]})) AS s
  FROM stoks WHERE len(t) >= 2
), sbgf AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM sbg),
scored AS (
  SELECT doc_id,
         coalesce(
           model.logp,
           ln(CAST(1 AS DOUBLE) / CAST(uni.c1 + vocab.v AS DOUBLE)),
           ln(CAST(1 AS DOUBLE) / CAST(vocab.v AS DOUBLE))
         ) AS lp
  FROM sbgf CROSS JOIN vocab
  LEFT JOIN uni USING (w1)
  LEFT JOIN model USING (w1, w2)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       exp(-(SUM(lp) / COUNT(*))) AS ppl
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def want():
    con = duckdb.connect()
    con.register("corpus", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
    con.register("score_docs",
                 pd.DataFrame(SCORE_DOCS, columns=["doc_id", "text"]))
    return con.execute(_TWIN).fetchdf()


def test_lm_matches_duckdb_twin(spark, want):
    corpus = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id bigint, text string")
    model, uni = train_bigram_lm(corpus)
    got = (
        score_perplexity(docs, model, uni)
        .orderBy("doc_id").toPandas()
    )
    # doc 12 has no bigram: absent from both results
    assert got["doc_id"].tolist() == want["doc_id"].tolist() == [10, 11, 13]
    assert got["n_bigrams"].tolist() == want["n_bigrams"].tolist()
    for g, w in zip(got["ppl"], want["ppl"]):
        assert g == pytest.approx(w, rel=1e-12)


def test_lm_semantics(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id bigint, text string")
    model, uni = train_bigram_lm(corpus)
    ppl = {r["doc_id"]: r["ppl"]
           for r in score_perplexity(docs, model, uni).collect()}
    # in-domain text scores (much) better than unseen-bigram text,
    # which scores better than all-unseen-word noise
    assert ppl[10] < ppl[11] < ppl[13]
    assert 12 not in ppl


def test_lm_scoring_plan_broadcasts(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id bigint, text string")
    model, uni = train_bigram_lm(corpus)
    plan = score_perplexity(docs, model, uni)._jdf.queryExecution(
    ).executedPlan().toString()
    # the three scoring-side joins (vocab cross, unigram backoff, model)
    # must all broadcast — the scored corpus is never shuffled. The
    # TRAINING subtree embedded in the plan may legitimately
    # sort-merge (model-scale keyed join), so only count BHJs here.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan or plan.count(
        "BroadcastExchange") >= 3


def test_score_join_strategy_plan_shape(spark):
    """broadcast=True must put BroadcastHashJoin on the model joins;
    broadcast=False (or an estimate above threshold) must not — the
    declared shuffle-join fallback for LMs too big to broadcast."""
    from trefoil_spark.operators.lm import score_perplexity, train_bigram_lm

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(4)],
        "doc_id bigint, text string",
    )
    model, uni = train_bigram_lm(corpus)
    docs = spark.createDataFrame(
        [(9, "the cat sat"), (10, "dogs bark loudly")],
        "doc_id bigint, text string",
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p_b = plan(score_perplexity(docs, model, uni, broadcast=True))
    p_s = plan(score_perplexity(docs, model, uni, broadcast=False))
    assert "BroadcastHashJoin" in p_b
    # shuffle mode: the two LEFT model joins must be shuffle joins
    # (SortMerge or ShuffledHash); only the 1-row vocab cross stays
    # broadcast, and it is a BroadcastNestedLoopJoin, not a BHJ
    assert "BroadcastHashJoin" not in p_s
    assert ("SortMergeJoin" in p_s) or ("ShuffledHashJoin" in p_s)

    # value parity across modes (and the tiny-model auto mode = broadcast)
    def vals(df):
        return {
            r["doc_id"]: (r["n_bigrams"], round(r["ppl"], 12))
            for r in df.collect()
        }

    assert vals(score_perplexity(docs, model, uni, broadcast=True)) == \
        vals(score_perplexity(docs, model, uni, broadcast=False))
    assert vals(score_perplexity(docs, model, uni)) == \
        vals(score_perplexity(docs, model, uni, broadcast=True))
    # the auto estimate flips to shuffle mode under a 1-byte threshold
    p_auto = plan(score_perplexity(docs, model, uni, broadcast_threshold=1))
    assert "BroadcastHashJoin" not in p_auto
