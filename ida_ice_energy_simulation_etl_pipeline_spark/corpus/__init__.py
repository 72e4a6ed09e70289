"""Composed training-corpus pipeline (filter → dedup → scrub → split →
pack → partitioned sink) built from the extension operators."""

from .pipeline import CorpusConfig, run_corpus_pipeline

__all__ = ["CorpusConfig", "run_corpus_pipeline"]
