"""Text-analysis operators over the ``documents`` table.

Language-ID (function-word heuristic), quality scoring, token counting,
and document fingerprinting — the text-side primitives of a training-data
pipeline.  All pure built-in column composition: tokenization and scoring
run inside whole-stage codegen with zero Python round-trips, so a 100 TB
corpus is one embarrassingly-parallel scan (no shuffle except the final
small group-by).

Cross-engine notes: tokenization is a literal single-space split
(== DuckDB ``string_split(text, ' ')``); hashes are md5 hex strings
(byte-identical in DuckDB); regexes stick to ASCII classes where Java
regex and RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import occurrence_count, punct_ratio, word_shingles, word_tokens
from ..plans.core import QuerySpec, ensure_parallelism, load_table

# Function-word profiles for the language-ID heuristic.  Deliberately tiny:
# language ID at scale is a per-row map-only op; the profile table is the
# tunable part.
_LANG_PROFILES: list[tuple[str, tuple[str, str]]] = [
    ("en", ("the", "a")),
    ("de", ("der", "und")),
    ("fr", ("le", "et")),
    ("es", ("el", "y")),
]


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), text, F.lit(" "))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language function-word occurrence scores (whole-word matches via
    space padding)."""
    padded = _padded(text)
    return {
        lang: occurrence_count(padded, f" {w1} ") + occurrence_count(padded, f" {w2} ")
        for lang, (w1, w2) in _LANG_PROFILES
    }


def predicted_lang(text: Column) -> Column:
    """Argmax over language scores, ties resolved in profile order —
    the same CASE cascade the oracle SQL uses."""
    s = lang_scores(text)
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en"
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )


def _occ_sql(needle: str) -> str:
    pad = "(' ' || text || ' ')"
    return (
        f"CAST((length({pad}) - length(replace({pad}, '{needle}', ''))) "
        f"/ {len(needle)} AS BIGINT)"
    )


def _lang_score_sql(lang: str) -> str:
    words = dict(_LANG_PROFILES)[lang]
    return " + ".join(_occ_sql(f" {w} ") for w in words)


# --------------------------------------------------------------------------
# Language ID
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        predicted_lang(F.col("text")).alias("predicted_lang"),
        "lang",
        (predicted_lang(F.col("text")) == F.col("lang")).alias("is_match"),
    )


LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('fr')} AS s_fr,
         {_lang_score_sql('es')} AS s_es
  FROM documents
),
pred AS (
  SELECT doc_id, lang,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END AS predicted_lang
  FROM scored
)
SELECT doc_id, predicted_lang, lang, predicted_lang = lang AS is_match
FROM pred
"""


# --------------------------------------------------------------------------
# Quality scoring: length / stopword / lexical-diversity signals, rolled up
# per source so the result stays small at any corpus size.
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    toks = word_tokens(F.col("text"))
    n_tokens = F.size(toks)
    per_doc = docs.select(
        "source",
        n_tokens.cast("long").alias("n_tokens"),
        (F.length("text").cast("double") / n_tokens).alias("avg_token_span"),
        (
            F.size(F.filter(toks, lambda t: t.isin("the", "a"))).cast("double")
            / n_tokens
        ).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens).alias(
            "type_token_ratio"
        ),
        punct_ratio(F.col("text")).alias("punct_ratio"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("avg_token_span"), 4).alias("avg_token_span"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
        F.round(F.avg("type_token_ratio"), 4).alias("avg_type_token_ratio"),
        F.round(F.avg("punct_ratio"), 4).alias("avg_punct_ratio"),
    )


TEXT_QUALITY_SQL = """
WITH per_doc AS (
  SELECT source,
         len(string_split(text, ' '))                                        AS n_tokens,
         CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))         AS avg_token_span,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
             / len(string_split(text, ' '))                                  AS stopword_ratio,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' '))                                  AS type_token_ratio,
         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
             / length(text)                                                  AS punct_ratio
  FROM documents
)
SELECT source,
       count(*)                       AS n_docs,
       round(avg(n_tokens), 4)        AS avg_tokens,
       round(avg(avg_token_span), 4)  AS avg_token_span,
       round(avg(stopword_ratio), 4)  AS avg_stopword_ratio,
       round(avg(type_token_ratio), 4) AS avg_type_token_ratio,
       round(avg(punct_ratio), 4)     AS avg_punct_ratio
FROM per_doc
GROUP BY source
"""


# --------------------------------------------------------------------------
# Token counting: whitespace tokens + a BPE-ish lowercase-alpha token class.
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    toks = word_tokens(F.col("text"))
    return docs.groupBy("source").agg(
        F.sum(F.size(toks)).cast("long").alias("total_tokens"),
        F.sum(F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))))
        .cast("long")
        .alias("alpha_tokens"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


TOKEN_COUNT_SQL = """
SELECT source,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT)  AS total_tokens,
       CAST(sum(len(list_filter(string_split(text, ' '),
                                t -> regexp_matches(t, '^[a-z]+$')))) AS BIGINT) AS alpha_tokens,
       CAST(sum(length(text)) AS BIGINT)                  AS total_chars
FROM documents
GROUP BY source
"""


# --------------------------------------------------------------------------
# Document fingerprinting: min-hash-of-shingles fingerprints (winnowing-
# lite).  Two granularities so containment vs near-identity are separable.
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    toks = word_tokens(F.col("text"))

    def min_md5(n: int) -> Column:
        return F.array_min(
            F.transform(word_shingles(toks, n), lambda s: F.md5(s.cast("binary")))
        )

    return docs.select(
        "doc_id",
        min_md5(3).alias("fp_3gram"),
        min_md5(5).alias("fp_5gram"),
    )


DOC_FINGERPRINT_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       list_min(list_transform(range(1, greatest(len(w) - 1, 1)),
                               i -> md5(array_to_string(w[i:i+2], ' ')))) AS fp_3gram,
       list_min(list_transform(range(1, greatest(len(w) - 3, 1)),
                               i -> md5(array_to_string(w[i:i+4], ' ')))) AS fp_5gram
FROM toks
"""


# --------------------------------------------------------------------------
# Benchmark-contamination check: which training documents share any
# 4-gram with the held-out eval set (source 'src0')?  The standard
# pre-training hygiene scan.  Shape: explode eval docs to DISTINCT
# n-gram hashes (the eval set is small — at scale this side is the
# broadcast side), LEFT SEMI join the exploded training n-grams against
# it (semi join: existence only, no fan-out, stops at first match per
# row), then distinct contaminated doc_ids → per-source rates.
# (Real corpora use 8-13-gram windows; the synthetic fixture's short
# random sentences need n=4 for a non-degenerate overlap signal.)
CONTAMINATION_NGRAM = 4


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    grams = F.explode(
        word_shingles(word_tokens(F.col("text")), CONTAMINATION_NGRAM)
    ).alias("gram")
    eval_grams = (
        docs.filter(F.col("source") == "src0")
        .select(grams)
        .select(F.xxhash64("gram").alias("gram_h"))
        .distinct()
    )
    train = docs.filter(F.col("source") != "src0")
    contaminated = (
        train.select("doc_id", "source", grams)
        .select("doc_id", "source", F.xxhash64("gram").alias("gram_h"))
        .join(F.broadcast(eval_grams), "gram_h", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    totals = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    hits = contaminated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return (
        totals.join(hits, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
    )


CONTAMINATION_CHECK_SQL = f"""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, greatest(len(w) - {CONTAMINATION_NGRAM - 2}, 1)),
                               i -> array_to_string(w[i:i+{CONTAMINATION_NGRAM - 1}], ' '))) AS gram
  FROM toks
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
contaminated AS (
  SELECT DISTINCT g.doc_id, g.source
  FROM grams g SEMI JOIN eval_grams e ON g.gram = e.gram
  WHERE g.source <> 'src0'
)
SELECT t.source,
       count(*) AS n_docs,
       coalesce(any_value(c.n), 0) AS n_contaminated
FROM documents t
LEFT JOIN (SELECT source, count(*) AS n FROM contaminated GROUP BY source) c
  ON c.source = t.source
WHERE t.source <> 'src0'
GROUP BY t.source
"""


# --------------------------------------------------------------------------
# Deterministic train/val/test split: assignment is a pure function of the
# doc's content hash, never of row order or partitioning — reproducible on
# any cluster size, stable under re-ingestion, and exactly re-derivable by
# the oracle.  (rand()-based sampling would be none of those.)  The split
# point is the first 4 hex chars of md5(doc_id) as an integer in [0, 2^16):
# < 80% → train, < 90% → val, else test.
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10).cast("long")
    split = (
        F.when(h < int(0.8 * 65536), "train")
        .when(h < int(0.9 * 65536), "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


DATASET_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT CASE
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) < {int(0.8 * 65536)} THEN 'train'
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) < {int(0.9 * 65536)} THEN 'val'
           ELSE 'test'
         END AS split,
         source, n_chars
  FROM documents
)
SELECT split, source, count(*) AS n_docs, sum(n_chars) AS total_chars
FROM assigned
GROUP BY 1, 2
"""


SPECS: list[QuerySpec] = [
    QuerySpec("lang_id", lang_id, LANG_ID_SQL, "ext:text"),
    QuerySpec("dataset_split", dataset_split, DATASET_SPLIT_SQL, "ext:split"),
    QuerySpec(
        "contamination_check",
        contamination_check,
        CONTAMINATION_CHECK_SQL,
        "ext:contamination,semi-join",
    ),
    QuerySpec("text_quality", text_quality, TEXT_QUALITY_SQL, "ext:text"),
    QuerySpec("token_count", token_count, TOKEN_COUNT_SQL, "ext:text"),
    QuerySpec("doc_fingerprint", doc_fingerprint, DOC_FINGERPRINT_SQL, "ext:text"),
]
