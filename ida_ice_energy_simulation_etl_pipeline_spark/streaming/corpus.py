"""Continuous corpus ingestion — the streaming half of corpus/pipeline.py.

New document files landing under a directory become micro-batches that
flow through the SAME map-side operators the batch pipeline (and its
DuckDB-verified registry queries) use: language+quality filter, PII
scrub, deterministic split assignment.  Exact dedup runs as
``dropDuplicatesWithinWatermark`` on the content hash — state is bounded
by the watermark horizon instead of growing with corpus history, the
standard trade for a continuous pipeline (a duplicate arriving AFTER the
horizon re-enters; the periodic batch dedup pass sweeps those).

Everything here is watermark-bounded or map-side: at 100 TB/day the only
state is the in-horizon hash set, and the sink appends split-partitioned
parquet exactly once per epoch (checkpointed file-sink semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..corpus.pipeline import CorpusConfig, _keep_pred
from ..operators.text import scrub_pii, split_col

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("source", StringType(), True),
        StructField("ingest_ts", TimestampType(), False),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """File-source document stream (new files under ``path`` become
    micro-batches) with the declared ingest schema."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    return reader.json(path) if fmt == "json" else reader.parquet(path)


def corpus_ingest_stream(
    docs: DataFrame,
    config: CorpusConfig | None = None,
    *,
    dedup_watermark: str = "1 hour",
) -> DataFrame:
    """filter → exact-dedup-within-watermark → scrub → split, streaming.

    The filter stage consumes the batch pipeline's ``_keep_pred``
    verbatim, so config-driven gates (including ``gopher_gate``, r12)
    apply identically in-stream — pinned by a stream==batch gate test.

    Returns the transformed stream (append output mode); wire it to a
    parquet sink with ``writeStream.partitionBy("split")`` or the
    exactly-once helpers in streaming/sink.py.
    """
    cfg = config or CorpusConfig()
    kept = docs.filter(_keep_pred(cfg))
    kept = kept.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
    # Bounded-state exact dedup: the first in-horizon copy wins; state is
    # (hashes seen within the watermark), NOT the whole corpus history.
    kept = kept.withWatermark("ingest_ts", dedup_watermark)
    kept = kept.dropDuplicatesWithinWatermark(["text_hash"])
    if cfg.scrub:
        kept = (
            scrub_pii(kept)
            .withColumn(
                "pii_redactions",
                F.col("n_email") + F.col("n_ip") + F.col("n_phone"),
            )
            .drop("text", "n_email", "n_ip", "n_phone")
            .withColumnRenamed("scrubbed", "text")
        )
    return kept.withColumn("split", split_col(F.col("doc_id")))


def run_incremental_dedup_stream(
    stream_docs: DataFrame,
    index_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Continuous incremental dedup: each micro-batch of incoming docs
    probes a STATIC indexed corpus — the streaming twin of
    ``operators/dedup.py::incremental_dedup``, run through
    ``foreachBatch`` so every micro-batch executes the SAME
    oracle-verified probe plan (``incremental_flags``: content-hash
    left join on the index's distinct-hash table + asymmetric LSH band
    join, batch-bounded work).  foreachBatch rather than a stream-side
    aggregation because the near layer's per-doc countDistinct over
    index hits is a distinct aggregate, which Structured Streaming
    forbids — and per-micro-batch probing is exactly equivalent anyway:
    flags depend only on (doc, index), never on other stream docs.
    Exactly-once: the flags land through the staged-rename
    ``idempotent_batch_writer`` (streaming/sink.py), so a replayed
    epoch is skipped, never double-appended.

    Returns the started StreamingQuery (availableNow trigger — drains
    what exists, then stops; production swaps a processing-time
    trigger).
    """
    from ..operators.dedup import incremental_flags
    from .sink import idempotent_batch_writer

    write = idempotent_batch_writer(out_dir)

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write(incremental_flags(batch_df, index_docs), epoch_id)

    return (
        stream_docs.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_decontamination_stream(
    stream_docs: DataFrame,
    eval_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    method: str = "winnow",
):
    """Continuous eval-set protection for an ingested corpus: each
    micro-batch's winnowed fingerprints (or capped n-grams) probe a
    STATIC eval index — the streaming twin of the batch pipeline's
    decontaminate stage and of ``winnow_contamination``'s criterion,
    run through ``foreachBatch`` so every micro-batch executes the
    SAME oracle-verified probe plan
    (``operators/text.py::decontamination_flags``).  Per-doc verdicts
    depend only on (doc, eval index), never on other stream docs, so
    per-micro-batch probing is exactly equivalent to the batch scan.

    The eval index is built ONCE at stream setup and materialized
    (``localCheckpoint``) — benchmarks are static relative to an
    ingest stream, and without truncation every epoch would re-winnow
    the whole eval set.  A cluster deployment persists the index to
    storage instead.  Exactly-once via the staged-rename
    ``idempotent_batch_writer`` (streaming/sink.py), same as the
    incremental-dedup stream above.

    Returns the started StreamingQuery (availableNow trigger — drains
    what exists, then stops; production swaps a processing-time
    trigger)."""
    from ..operators.text import decon_eval_index, decontamination_flags
    from .sink import idempotent_batch_writer

    eval_index = decon_eval_index(eval_docs, method).localCheckpoint(
        eager=True
    )
    write = idempotent_batch_writer(out_dir)

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write(decontamination_flags(batch_df, eval_index, method), epoch_id)

    return (
        stream_docs.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_eval_leak_stream(
    stream_docs: DataFrame,
    eval_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Continuous eval-leak monitoring for an ingested corpus: each
    micro-batch of incoming training docs is profiled against the
    static held-out eval set — the streaming twin of the batch
    pipeline's ``--leak-report`` stage, run through ``foreachBatch`` so
    every micro-batch executes the SAME oracle-verified builder
    (``operators/text.py::eval_leak_profile_frame``).  Each epoch lands
    PER-BATCH eval-grain leak counters (eval_doc_id, n_train_docs,
    n_shared_fps, n_hits — explicit zeros for eval docs the batch never
    touched); ``n_train_docs`` and ``n_hits`` are ADDITIVE across
    epochs (a train doc lives in exactly one micro-batch), so the
    accumulated sums equal the batch operator over the union —
    ``n_shared_fps`` is per-batch only (the same fingerprint can hit
    from several batches; distinct-across-epochs is not a streaming
    aggregate).  The one scoping caveat, documented rather than hidden:
    the train-side boilerplate df cap (WINNOW_PAIR_DF_CAP) applies
    per batch — a fingerprint whose GLOBAL df exceeds the cap while
    every per-batch df stays under it is suppressed by the batch
    operator but counted here; the cap is a fan-out bound in both
    readings.  The eval side is benchmark-sized and winnowed ONCE at
    stream setup into a checkpointed fingerprint index (the decon
    stream's static-index discipline; r14 verdict item 5 — previously
    each epoch re-derived it); per epoch only the train side is
    winnowed.  A cluster deployment persists the index to storage
    instead of a localCheckpoint.  Exactly-once via the staged-rename
    ``idempotent_batch_writer``, same as the decontamination stream
    above.

    Returns the started StreamingQuery (availableNow trigger — drains
    what exists, then stops; production swaps a processing-time
    trigger)."""
    from ..operators.text import (
        eval_leak_eval_index,
        eval_leak_profile_from_index,
    )
    from .sink import idempotent_batch_writer

    eval_ex, universe = eval_leak_eval_index(
        eval_docs.select("doc_id", "text")
    )
    eval_ex = eval_ex.localCheckpoint(eager=True)
    universe = universe.localCheckpoint(eager=True)
    write = idempotent_batch_writer(out_dir)

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write(
            eval_leak_profile_from_index(
                batch_df.select("doc_id", "text"), eval_ex, universe
            ),
            epoch_id,
        )

    return (
        stream_docs.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------------------------------------
# Continuous corpus drift monitoring — the streaming consumer of the
# batch corpus-health panel (operators/text.py::zipf_fit,
# source_divergence): per ingest window and source, compare the live
# token statistics against a STATIC per-source baseline and flag
# sources whose mix moved.  The window aggregate is watermark-bounded
# (state = in-horizon windows × sources), the baseline join is
# stream-static broadcast, and every signal is map-side until the one
# windowed aggregate — the same posture as the rest of this module.
DRIFT_STOPWORDS = ("the", "a")  # the quality_logit stopword set
DRIFT_VOCAB_V = 16  # distribution-drift vocabulary size
DRIFT_JS_THRESHOLD = 0.05  # nats; JS ∈ [0, ln 2]


def drift_vocab(docs: DataFrame, top_v: int = DRIFT_VOCAB_V) -> list[str]:
    """The fixed vocabulary the distribution-drift signal tracks: the
    top-``top_v`` global tokens of the baseline snapshot (count desc,
    token asc — deterministic).  A one-time driver collect of V rows at
    model-fit time (the quality-classifier pattern); the live stream
    never recomputes it."""
    rows = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(top_v)
        .collect()
    )
    return [r["tok"] for r in rows]


def source_baseline_frame(
    docs: DataFrame, vocab: "list[str] | None" = None
) -> DataFrame:
    """Per-source baseline from a batch corpus snapshot: the reference
    point the live windows are compared against.  Compute once offline,
    persist, broadcast into the stream.

    With ``vocab`` (see drift_vocab), also emits ``base_probs`` — the
    source's unigram probability over the tracked vocabulary, aligned
    to vocab order — which arms the per-window Jensen-Shannon
    distribution-drift signal in corpus_drift_frame."""
    toks = F.split(F.col("text"), " ")
    vocab_counts = (
        [
            F.size(F.filter(toks, lambda t: t == F.lit(v)))
            .cast("long")
            .alias(f"_vc_{i}")
            for i, v in enumerate(vocab)
        ]
        if vocab
        else []
    )
    base = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.filter(toks, lambda t: t.isin(*DRIFT_STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        *vocab_counts,
    )
    aggs = [
        (F.sum("n_toks").cast("double") / F.count(F.lit(1))).alias(
            "base_avg_tokens"
        ),
        (F.sum("n_stop").cast("double") / F.sum("n_toks")).alias(
            "base_stop_ratio"
        ),
    ]
    if vocab:
        aggs.append(
            F.array(
                *[
                    F.sum(f"_vc_{i}").cast("double") / F.sum("n_toks")
                    for i in range(len(vocab))
                ]
            ).alias("base_probs")
        )
    return base.groupBy("source").agg(*aggs)


def _js_divergence(p_arr: Column, q_arr: Column) -> Column:
    """Jensen-Shannon divergence between two probability arrays over the
    tracked vocabulary, each extended with an implicit 'other' bucket
    (1 − Σ) so the two distributions cover the same V+1 outcomes — the
    closed-form absent-mass treatment, exact (no dense vocab cross).
    The per-element fold is F.aggregate — a sequential in-row reduction,
    so the accumulation order is deterministic on both engines."""

    def term(p, q):
        # 0.5·p·ln(2p/(p+q)) + 0.5·q·ln(2q/(p+q)), with 0·ln0 = 0
        return F.when(
            p > 0, F.lit(0.5) * p * F.log(F.lit(2.0) * p / (p + q))
        ).otherwise(F.lit(0.0)) + F.when(
            q > 0, F.lit(0.5) * q * F.log(F.lit(2.0) * q / (p + q))
        ).otherwise(F.lit(0.0))

    present = F.aggregate(
        F.zip_with(p_arr, q_arr, term),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sum_of = lambda arr: F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    p_other = F.lit(1.0) - sum_of(p_arr)
    q_other = F.lit(1.0) - sum_of(q_arr)
    return present + term(p_other, q_other)


def _vocab_entropy(p_arr: Column) -> Column:
    """Shannon entropy (nats) of a probability array over the tracked
    vocabulary + the implicit 'other' bucket — the streaming consumer
    of the batch health panel's entropy signal, over the SAME V+1
    outcomes the JS arm covers.  F.aggregate again: deterministic
    sequential fold, 0·ln0 = 0."""

    def term(p):
        return F.when(p > 0, -p * F.log(p)).otherwise(F.lit(0.0))

    present = F.aggregate(
        F.transform(p_arr, term), F.lit(0.0), lambda acc, x: acc + x
    )
    other = F.lit(1.0) - F.aggregate(
        p_arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return present + term(other)


def corpus_drift_frame(
    docs: DataFrame,
    baseline: DataFrame,
    *,
    vocab: "list[str] | None" = None,
    window_dur: str = "10 minutes",
    rel_tokens_threshold: float = 0.25,
    abs_stop_threshold: float = 0.05,
    js_threshold: float = DRIFT_JS_THRESHOLD,
) -> DataFrame:
    """Shared stream/batch drift computation: enrich each document with
    its source baseline (stream-static BROADCAST join BEFORE the
    aggregate — the canonical enrichment shape, legal in every streaming
    output mode), then one windowed aggregate per (window, source) and
    the drift flags.  The baseline columns are functionally dependent on
    source, so carrying them through the groupBy adds no grain.

    With ``vocab`` (the baseline must then carry ``base_probs`` from
    ``source_baseline_frame(docs, vocab)``), each window also gets its
    Jensen-Shannon divergence against the source's baseline unigram
    distribution over that vocabulary (+ closed-form 'other' bucket) —
    the streaming consumer of the batch health panel's divergence
    signal.  The per-vocab-token counts are IN-ROW array filters summed
    inside the SAME single windowed aggregate, so the shape stays legal
    in every output mode; no token-grain state, no second aggregation."""
    toks = F.split(F.col("text"), " ")
    vocab = vocab or []
    vocab_counts = [
        F.size(F.filter(toks, lambda t: t == F.lit(v)))
        .cast("long")
        .alias(f"_vc_{i}")
        for i, v in enumerate(vocab)
    ]
    base_cols = ["base_avg_tokens", "base_stop_ratio"] + (
        ["base_probs"] if vocab else []
    )
    base = docs.join(F.broadcast(baseline), "source").select(
        "source",
        "ingest_ts",
        *base_cols,
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.filter(toks, lambda t: t.isin(*DRIFT_STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        *vocab_counts,
    )
    agg = base.groupBy(
        F.window("ingest_ts", window_dur).alias("w"),
        "source",
        *base_cols,
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_toks"),
        F.sum("n_stop").cast("long").alias("n_stop"),
        *[
            F.sum(f"_vc_{i}").cast("long").alias(f"_wc_{i}")
            for i in range(len(vocab))
        ],
        # the df half of the burstiness arm: containment derives from
        # the per-doc count column already computed above — no second
        # array-filter HOF per tracked token (HOF lambdas evaluate
        # interpreted with no common-subexpression elimination; see the
        # simhash note in operators/dedup.py)
        *[
            F.sum((F.col(f"_vc_{i}") > 0).cast("long"))
            .cast("long")
            .alias(f"_wd_{i}")
            for i in range(len(vocab))
        ],
    )
    avg_tokens = F.col("n_toks").cast("double") / F.col("n_docs")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_toks")
    rel = F.abs(avg_tokens - F.col("base_avg_tokens")) / F.col(
        "base_avg_tokens"
    )
    sabs = F.abs(stop_ratio - F.col("base_stop_ratio"))
    js_cols = []
    if vocab:
        p_arr = F.array(
            *[
                F.col(f"_wc_{i}").cast("double") / F.col("n_toks")
                for i in range(len(vocab))
            ]
        )
        js = _js_divergence(p_arr, F.col("base_probs"))
        # per-window burstiness (r13): the health panel's member-#5
        # signal over the tracked vocab — mean tf/df of the tokens
        # PRESENT in the window (boilerplate stamped several times into
        # each doc drives tf past df mid-stream long before it moves
        # the JS or entropy arms).  Pure in-row arithmetic over the
        # window's (tf, df) sums — zero extra aggregation; NULL when
        # no tracked token appears in the window.
        burst_num = sum(
            (
                F.when(
                    F.col(f"_wd_{i}") > 0,
                    F.col(f"_wc_{i}").cast("double") / F.col(f"_wd_{i}"),
                ).otherwise(F.lit(0.0))
            )
            for i in range(len(vocab))
        )
        burst_den = sum(
            (F.col(f"_wd_{i}") > 0).cast("long") for i in range(len(vocab))
        )
        js_cols = [
            F.round(js, 6).alias("js_divergence"),
            (js > js_threshold).alias("dist_drifted"),
            # per-window vocab entropy (r12): the entropy arm of the
            # health panel over the same V+1 outcomes — zero extra
            # aggregation, a pure fold over the window's vocab counts
            F.round(_vocab_entropy(p_arr), 6).alias("vocab_entropy"),
            F.round(
                F.when(burst_den > 0, burst_num / burst_den), 6
            ).alias("vocab_burstiness"),
        ]
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "source",
        "n_docs",
        F.round(avg_tokens, 4).alias("avg_tokens"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        (rel > rel_tokens_threshold).alias("tokens_drifted"),
        (sabs > abs_stop_threshold).alias("stopwords_drifted"),
        *js_cols,
    )


def corpus_drift_stream(
    docs: DataFrame,
    baseline: DataFrame,
    *,
    vocab: "list[str] | None" = None,
    window_dur: str = "10 minutes",
    watermark: str = "10 minutes",
    rel_tokens_threshold: float = 0.25,
    abs_stop_threshold: float = 0.05,
    js_threshold: float = DRIFT_JS_THRESHOLD,
) -> DataFrame:
    """Watermarked windowed stats against the static per-source baseline
    with drift flags (+ the per-window JS distribution drift when
    ``vocab`` is armed).  Update/complete modes emit windows as they
    fill; in append mode the watermark closes them — state is bounded
    either way (in-horizon windows × sources)."""
    return corpus_drift_frame(
        docs.withWatermark("ingest_ts", watermark),
        baseline,
        vocab=vocab,
        window_dur=window_dur,
        rel_tokens_threshold=rel_tokens_threshold,
        abs_stop_threshold=abs_stop_threshold,
        js_threshold=js_threshold,
    )
