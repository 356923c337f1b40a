"""Text analysis for web-scale training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Not in the reference (trefoil is raster-only) — required by the graft's
training-data-pipeline mandate. Everything is pure Catalyst expressions
(whole-stage codegen, zero Python) with exact DuckDB SQL twins:

- tokens: split on single space (the synthetic corpus is space-joined).
- portable token hash: first 15 hex digits of md5 → BIGINT. md5 is
  identical everywhere; 15 hex digits < 2^60 so the cast is exact in both
  engines.
- fingerprint: order-sensitive polynomial rolling hash folded over the
  token array (arrays preserve order in both engines), modulus P_FP
  small enough that acc*31 + h never overflows int64 (ANSI-safe).
- quality score: rational arithmetic only (counts and exact ratios).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P_FP = (1 << 40) - 87  # prime; keeps acc*31 + h < 2^46 (no int64 overflow)

STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "mit", "von", "zu", "den", "nicht"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "por"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "du", "une", "est"),
}


# --- Spark column builders ---

def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def token_count_col(text_col: str = "text") -> Column:
    return F.size(tokens_col(text_col))


def token_hash_expr(token_expr: str) -> str:
    """Portable token→int hash (Spark SQL dialect)."""
    return f"CAST(CONV(SUBSTR(MD5({token_expr}), 1, 15), 16, 10) AS BIGINT)"


def token_hash_expr_duckdb(token_expr: str) -> str:
    return f"CAST(('0x' || substr(md5({token_expr}), 1, 15)) AS BIGINT)"


def fingerprint_col(text_col: str = "text") -> Column:
    """Order-sensitive rolling hash over tokens (doc fingerprint)."""
    h = token_hash_expr("t")
    return F.expr(
        f"aggregate(transform(split({text_col}, ' '), t -> {h} % {P_FP}), "
        f"0L, (acc, x) -> (acc * 31 + x) % {P_FP})"
    )


def fingerprint_sql_duckdb(text_col: str = "text") -> str:
    h = token_hash_expr_duckdb("t")
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({text_col}, ' '), t -> {h} % {P_FP})), "
        f"(acc, x) -> (acc * 31 + x) % {P_FP})"
    )


def stopword_count_col(lang: str, text_col: str = "text") -> Column:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"size(filter(split({text_col}, ' '), t -> t IN ({words})))"
    )


def stopword_count_sql_duckdb(lang: str, text_col: str = "text") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split({text_col}, ' '), t -> t IN ({words})))"
    )


def lang_id_col(text_col: str = "text") -> Column:
    """Heuristic language-ID: argmax stopword hits, tie/zero → 'und'."""
    langs = list(STOPWORDS)
    counts = [stopword_count_col(lang, text_col).alias(f"_c_{lang}") for lang in langs]
    best = F.greatest(*[F.col(f"_c_{lang}") for lang in langs])
    expr = F.when(best == 0, F.lit("und"))
    for lang in langs:  # first max wins (deterministic order)
        expr = expr.when(F.col(f"_c_{lang}") == best, F.lit(lang))
    return expr, counts


def quality_exprs(text_col: str = "text") -> dict[str, Column]:
    """Deterministic quality features: all counts/exact ratios."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_distinct = F.size(F.array_distinct(toks))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_distinct_tokens": n_distinct,
        "type_token_ratio": n_distinct.cast("double") / n_tokens,
        "mean_token_len": (n_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens,
    }


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text features in one codegen pass."""
    q = quality_exprs(text_col)
    lang_expr, count_cols = lang_id_col(text_col)
    out = df.select(
        "*",
        *[c.alias(n) for n, c in q.items()],
        fingerprint_col(text_col).alias("fingerprint"),
        *count_cols,
    )
    return out.withColumn("lang_pred", lang_expr).drop(
        *[f"_c_{lang}" for lang in STOPWORDS]
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (webtext payload core; r3)
# ---------------------------------------------------------------------------

def build_rich_html_col(text_col: str = "text", title_col: str = "source") -> Column:
    """Realistic page markup around the payload: head/title, a script
    block, entity noise in an attribute — only the <body> paragraph holds
    the extractable text. Pure Catalyst (concat), so construction and
    extraction both stay JVM-side."""
    return F.concat(
        F.lit('<html><head><title>'), F.col(title_col),
        F.lit('</title><style>p{color:#000}</style></head>'
              '<body data-x="a-b">'
              '<script>var t="</p>";track();</script><p>'),
        F.col(text_col),
        F.lit("</p></body></html>"),
    )


def extract_text_col(html_col) -> Column:
    """Strip a page down to its body text: drop script/style blocks
    (lazy, dotall — their content may contain markup-lookalikes), take
    the <body> element, remove remaining tags. The per-row invariant the
    engine guarantees (north rule): applied to `build_rich_html_col`
    output this recovers the original text BYTES exactly."""
    col = html_col if not isinstance(html_col, str) else F.col(html_col)
    no_script = F.regexp_replace(col, r"(?s)<script.*?</script>", "")
    no_style = F.regexp_replace(no_script, r"(?s)<style.*?</style>", "")
    body = F.regexp_extract(no_style, r"(?s)<body[^>]*>(.*)</body>", 1)
    return F.regexp_replace(body, r"(?s)<[^>]*>", "")
