"""Column-expression helpers (all pure built-in composition).

Cross-engine determinism notes (these expressions are hash-compared against
a DuckDB oracle by the driver):

* ``dow_monday0`` — pandas/the reference use Monday=0
  (reference src/etl/transform/__init__.py:173-184); Spark ``dayofweek`` is
  1=Sunday, DuckDB ``isodow`` is 1=Monday.  The shim normalizes all three.
* Hashing for dedup uses ``md5`` (hex string) — byte-identical between
  Spark and DuckDB, unlike Spark's murmur3 ``hash()``.
* Vector math is done in DOUBLE precision with a left-to-right fold so the
  floating-point accumulation order matches DuckDB's list kernels closely
  enough that a round() at the edge is stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_pz(expr: Column, scale: int) -> Column:
    """Round a double to ``scale`` digits and canonicalize IEEE negative
    zero to +0.0.

    Spark's ``round`` (BigDecimal HALF_UP) has no signed zero and emits
    +0.0; DuckDB's float ``round`` preserves the sign, so a tiny negative
    argument (e.g. a PMI of -3.4e-6) rounds to **-0.0** on the oracle and
    **+0.0** on Spark — value-equal under ``==`` but distinct to the
    driver's value hash (the round-13 ``collocation_pmi`` red row).  The
    ``+ 0.0`` maps -0.0 to +0.0 (IEEE: -0.0 + 0.0 = +0.0 under
    round-to-nearest) and leaves every other value and NULL unchanged.
    Every oracle-backed rounded-double surface whose argument can be
    negative rounds through this helper, and its DuckDB oracle mirrors it
    via :func:`round_pz_sql`.
    """
    return F.round(expr, scale) + F.lit(0.0)


def round_pz_sql(expr: str, scale: int) -> str:
    """DuckDB fragment mirroring :func:`round_pz`:
    ``round(expr, scale) + 0.0`` — canonicalizes the oracle's signed zero
    so both engines hash identically."""
    return f"round({expr}, {scale}) + 0.0"


def epoch_us(ts: Column | str) -> Column:
    """Exact integer microseconds since the epoch, for TIMESTAMP *or*
    TIMESTAMP_NTZ inputs.

    Naive parquet timestamps (isAdjustedToUTC=false) read as TIMESTAMP_NTZ
    under Spark's default ``inferTimestampNTZ``, and ``unix_micros`` rejects
    NTZ outright.  ``to_utc_timestamp(_, 'UTC')`` reinterprets the NTZ wall
    time as UTC (and is a no-op for LTZ under a UTC session), which is
    exactly DuckDB's ``epoch_us`` on a naive timestamp — so both engines
    agree to the microsecond regardless of how the scan typed the column.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(F.to_utc_timestamp(c, "UTC"))


def epoch_us_sql(col: str) -> str:
    """SQL-fragment twin of :func:`epoch_us` for ``F.expr`` call sites."""
    return f"unix_micros(to_utc_timestamp({col}, 'UTC'))"


def dow_monday0(ts: Column) -> Column:
    """Day-of-week with Monday=0 .. Sunday=6 (pandas convention,
    reference src/etl/transform/__init__.py:182)."""
    return (F.dayofweek(ts) + F.lit(5)) % F.lit(7)


def is_weekend(ts: Column) -> Column:
    """Weekend flag: dow >= 5 under Monday=0 (reference transform/__init__.py:183)."""
    return dow_monday0(ts) >= F.lit(5)


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization — single-space split to mirror DuckDB
    ``string_split(text, ' ')`` exactly (no regex, no trimming)."""
    return F.split(text, " ")


PUNCT_CLASS = "[.,;:!?]"


def punct_ratio(text: Column) -> Column:
    """Fraction of characters in the basic punctuation class — the
    punctuation-density quality signal (NULL on empty text, like any
    0/0 ratio)."""
    n_punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return n_punct.cast("double") / F.length(text)


def word_shingles(tokens: Column, n: int) -> Column:
    """All n-word shingles (space-joined) of a token array, in order.

    Equivalent DuckDB: ``list_transform(range(1, len(w) - n + 2),
    i -> array_to_string(w[i:i+n-1], ' '))``.
    Returns an empty array when the document has fewer than n tokens
    (guarded explicitly: Spark ``sequence(1, 0)`` would count DOWN, while
    DuckDB ``range(1, 1)`` is empty).
    """
    shingle = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.when(F.size(tokens) >= F.lit(n), shingle).otherwise(
        F.array().cast("array<string>")
    )


def hashed_word_shingles(tokens: Column, n: int) -> Column:
    """64-bit hashes of all n-word shingles, in order — the shape to use
    when the shingle only ever travels AS a hash (span dedup grouping,
    join keys): ``xxhash64`` consumes the n-token slice array directly,
    skipping the per-shingle string assembly ``word_shingles`` pays.

    Group-equivalent to ``xxhash64`` of the space-joined shingle:
    ``word_tokens`` splits on ' ', so tokens are space-free and the join
    is injective — two windows collide under the array hash iff they are
    the same token sequence (modulo the same ~n²/2⁶⁵ 64-bit collision
    odds the string hash carries).  NOT interchangeable where the
    shingle string itself (or its md5) is exposed or compared against an
    oracle's string hash — those sites keep :func:`word_shingles`.
    """
    hashed = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
        lambda i: F.xxhash64(F.slice(tokens, i, n)),
    )
    return F.when(F.size(tokens) >= F.lit(n), hashed).otherwise(
        F.array().cast("array<bigint>")
    )


def l2_norm_sql(vec: str) -> str:
    """SQL-fragment twin of :func:`l2_norm` (same fold, same DOUBLE
    accumulation — parses to the identical Catalyst expression)."""
    return (
        f"sqrt(aggregate({vec}, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def l2_norm(vec: Column | str) -> Column:
    """Euclidean norm of an array column, accumulated in DOUBLE.

    Pass the column NAME (or any SQL fragment) instead of a Column to
    build the whole fold in ONE ``F.expr`` parse: the lambda-based
    higher-order builders cost ~8 py4j round-trips each (measured ~15 ms
    per call of pure driver latency), which the single-string form avoids
    while producing the same expression tree.
    """
    if isinstance(vec, str):
        return F.expr(l2_norm_sql(vec))
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine for HIGH-VOLUME reranks.

    ``cosine_similarity`` (below) folds per element inside the JVM — ideal
    up to ~10⁴ pairs, but higher-order-function folds are interpreted per
    element, so at ~10⁶ candidate pairs (LSH rerank) a batched numpy
    kernel wins ~2.5×.  Same math, DOUBLE accumulation; results agree to
    float ulps (both sides round(4) before any comparison).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="float64")
        xm = np.stack(x.to_numpy()).astype(np.float64)
        ym = np.stack(y.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", xm, ym)
        den = np.sqrt(np.einsum("ij,ij->i", xm, xm)) * np.sqrt(
            np.einsum("ij,ij->i", ym, ym)
        )
        return pd.Series(num / den)

    return _cos(a, b)


def cosine_similarity_sql(a: str, b: str) -> str:
    """SQL-fragment twin of :func:`cosine_similarity` — identical fold
    order and DOUBLE accumulation, so results are bit-equal."""
    dot = (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    # try_divide + NaN-coalesce: a zero divisor means one vector is
    # all-zero, which forces dot = 0, so the pre-ANSI result was always
    # 0/0 = NaN — reproduce that under ANSI (where a bare `/` throws
    # DIVIDE_BY_ZERO) so downstream nanvl() pinning keeps working.
    return (
        f"coalesce(try_divide({dot}, "
        f"({l2_norm_sql(a)} * {l2_norm_sql(b)})), CAST('NaN' AS DOUBLE))"
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array columns in DOUBLE precision.

    Pure built-in composition (``zip_with`` + ``aggregate``) — stays in
    whole-stage codegen; no Python/pandas round-trip.  Pass column NAMES
    to build the tree in one ``F.expr`` parse (the lambda builders cost
    ~60 ms of py4j round-trips per call site; see :func:`l2_norm`).
    """
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(cosine_similarity_sql(a, b))
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    # same ANSI-safe shape as the SQL twin above: zero norm ⇒ dot = 0 ⇒
    # pre-ANSI NaN, reproduced via try_divide + coalesce.
    return F.coalesce(
        F.try_divide(dot, l2_norm(a) * l2_norm(b)),
        F.lit(float("nan")).cast("double"),
    )


def occurrence_count(text: Column, needle: str) -> Column:
    """Number of occurrences of a literal substring.

    ``(len(text) - len(replace(text, needle, ''))) / len(needle)`` — the
    same arithmetic identity works verbatim in DuckDB, so oracle SQL can
    reproduce it exactly.
    """
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")
