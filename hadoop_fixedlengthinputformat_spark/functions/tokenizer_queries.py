"""Tokenizer-training queries (round-2 tail registrations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.functions import text
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query("llm_bpe_train")  # iterative, data-dependent argmax per round — rows-only
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table training over the documents corpus (8 rounds).
    The corpus collapses to a word-frequency table first, so every
    iterative pass runs over |vocab| rows — the property that makes
    tokenizer training feasible at 100 TB (see text.bpe_train).
    Merge order pinned to the textbook walkthrough in tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents")
    return text.bpe_train(d, n_merges=8)
