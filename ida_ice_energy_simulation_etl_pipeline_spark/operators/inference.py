"""Batched model inference over text — the embed-the-corpus pattern.

A production embedding job loads the model ONCE PER TASK (not per batch,
never per row) and streams Arrow batches through it; the output is a
fixed-width vector column that feeds the ANN / semantic-dedup operators
downstream.  No ML runtime ships in this container, so the "model" is a
deterministic stand-in — a seeded random projection over hashed-token
counts — but every Spark-side piece is the real shape:

* iterator-form ``mapInPandas`` — the model loads once per task inside
  the generator, amortized across ALL Arrow batches of the partition;
* numpy batch matmul per Arrow batch (BLAS, never per-row Python);
* ``array<float>`` output column appended to the input schema, unit-L2
  normalized (NULL for token-free text — never a contract-violating zero
  vector), ready for ``cosine_similarity`` / ``embedding_near_pairs`` /
  ``kmeans_refine`` without adaptation.

Determinism: token bucketing uses crc32 (not Python ``hash``, which is
salted per process) and the projection matrix derives from a fixed seed,
so embeddings are a pure function of the text — invariant under
partitioning, batch boundaries, and cluster size (tested).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

EMBED_DIM = 32
HASH_BUCKETS = 256
_MODEL_SEED = 1234


def _load_model(dim: int, seed: int = _MODEL_SEED):
    """The per-task 'model': a deterministic random projection matrix.
    (A real job would load transformer weights here — same call site,
    same once-per-task amortization.)"""
    import numpy as np

    rng = np.random.RandomState(seed)
    # float64 weights: BLAS sgemm blocking varies with batch shape, so a
    # float32 pipeline drifts in the last ulp when Arrow batch sizes
    # change — accumulating in double and casting the OUTPUT to float32
    # makes embeddings exactly batch-size-invariant (tested).
    return rng.standard_normal((HASH_BUCKETS, dim))


def _featurize(texts: "pd.Series", buckets: int):
    """Hashed bag-of-tokens counts — the tokenizer stand-in.  crc32 keeps
    the bucketing deterministic across Python workers."""
    import numpy as np

    feats = np.zeros((len(texts), buckets), dtype=np.float64)
    for i, t in enumerate(texts):
        for tok in (t or "").split():
            feats[i, zlib.crc32(tok.encode()) % buckets] += 1.0
    return feats


def embed_documents(
    docs: DataFrame, text_col: str = "text", dim: int = EMBED_DIM
) -> DataFrame:
    """Append a unit-L2 ``embedding array<float>`` column computed by the
    batched-inference stand-in.  Map-only; one model load per task."""
    out_schema = StructType(
        list(docs.schema.fields)
        + [StructField("embedding", ArrayType(FloatType()), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = _load_model(dim)  # once per task, amortized over batches
        for pdf in it:
            emb = _featurize(pdf[text_col], HASH_BUCKETS) @ weights
            norms = np.sqrt(np.einsum("ij,ij->i", emb, emb))
            empty = norms == 0.0  # zero-token text has no direction
            norms[empty] = 1.0
            emb = (emb / norms[:, None]).astype(np.float32)
            pdf = pdf.copy()
            # NULL, not a zero vector, for token-free text: a zero vector
            # would silently violate the unit-L2 contract downstream
            # (sign-bucket LSH and argmax assignment both misbehave on it).
            pdf["embedding"] = [
                None if e else row.tolist() for e, row in zip(empty, emb)
            ]
            yield pdf

    return docs.mapInPandas(batches, schema=out_schema)
