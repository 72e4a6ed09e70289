"""Property-based tests (hypothesis) for the shared column expressions —
each Spark expression is checked against a plain-Python reference model
over generated inputs."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ida_ice_energy_simulation_etl_pipeline_spark.functions import (
    cosine_similarity,
    dow_monday0,
    occurrence_count,
    punct_ratio,
    word_shingles,
    word_tokens,
)

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=0, max_size=12
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sql(spark):
    def run(expr_fn, rows, schema):
        df = spark.createDataFrame(rows, schema)
        return [r["out"] for r in df.select(expr_fn(df).alias("out")).collect()]

    return run


@given(words=WORDS, n=st.integers(2, 4))
@SLOW
def test_word_shingles_matches_python(sql, words, n):
    text = " ".join(words)
    expected = (
        [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if len(words) >= n and words
        else []
    )
    # NB: split("", " ") yields [""] — mirror the engine's tokenizer model
    toks = text.split(" ")
    expected = (
        [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if len(toks) >= n
        else []
    )
    [got] = sql(
        lambda df: word_shingles(word_tokens(df.text), n), [(text,)], ["text"]
    )
    assert got == expected


@given(
    text=st.text(alphabet="ab c", max_size=30),
    needle=st.sampled_from(["a", "ab", "b c", "c"]),
)
@SLOW
def test_occurrence_count_matches_str_count(sql, text, needle):
    # replace-based counting == non-overlapping left-to-right count
    expected = text.count(needle)
    [got] = sql(
        lambda df: occurrence_count(df.text, needle), [(text,)], ["text"]
    )
    assert got == expected


@given(text=st.text(alphabet="ab .,;:!?", min_size=1, max_size=40))
@SLOW
def test_punct_ratio_matches_python(sql, text):
    expected = sum(c in ".,;:!?" for c in text) / len(text)
    [got] = sql(lambda df: punct_ratio(df.text), [(text,)], ["text"])
    assert got == pytest.approx(expected, abs=1e-12)


@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=2, max_size=8
    )
)
@SLOW
def test_cosine_self_similarity_is_one(sql, vec):
    if not any(abs(v) > 1e-6 for v in vec):
        return  # zero vector: cosine undefined
    [got] = sql(
        lambda df: cosine_similarity(df.a, df.b), [(vec, vec)], ["a", "b"]
    )
    assert got == pytest.approx(1.0, abs=1e-9)


@given(
    epoch_day=st.integers(0, 30000),
)
@SLOW
def test_dow_monday0_matches_python_weekday(sql, epoch_day):
    dt = datetime.fromtimestamp(epoch_day * 86400, tz=timezone.utc)
    [got] = sql(
        lambda df: dow_monday0(df.ts),
        [(dt.replace(tzinfo=None),)],
        ["ts"],
    )
    assert got == dt.weekday()  # python weekday(): Monday=0


def test_cosine_known_value(sql):
    [got] = sql(
        lambda df: cosine_similarity(df.a, df.b),
        [([1.0, 0.0], [0.0, 1.0])],
        ["a", "b"],
    )
    assert got == pytest.approx(0.0, abs=1e-12)
    [got2] = sql(
        lambda df: cosine_similarity(df.a, df.b),
        [([1.0, 2.0], [2.0, 4.0])],
        ["a", "b"],
    )
    assert got2 == pytest.approx(1.0, abs=1e-12)


def test_word_shingles_short_input_empty(sql):
    [got] = sql(lambda df: word_shingles(word_tokens(df.t), 3), [("one two",)], ["t"])
    assert got == []
