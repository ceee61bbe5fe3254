"""Query/oracle registry backing ``__spark_entry__.py``.

Every operator declared in SURVEY.md §2.3 registers here as a named
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle SQL string.  The driver hash-compares the two at sf0.01;
``tests/test_oracle_parity.py`` runs the same comparison locally first.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB-runnable ANSI SQL
    over the pre-registered views (region nation customer supplier part
    orders lineitem events documents embeddings).  Omit ``oracle`` for
    non-SQL-expressible ops (driver records a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


# The driver's correctness harness grades the FIRST 50 registered queries
# each round.  Registration order is therefore an explicit, versioned
# artifact: after importing every module, ``load_all`` rebuilds QUERIES in
# GRADE_ORDER — priority names first (in order), everything else after in
# original registration order.  Rotate by editing GRADE_ORDER each round.
#
# Grading history: r1 greened the relational families (projection/filter,
# joins, aggregates, windows, sort/setops, subqueries); r2 greened
# scans/sinks (17) + scalar fns (22) + the LLM head (11), with 3 red rows.
#
# ROUND 4 WINDOW (this list's first 50), per VERDICT r3 order #1:
# the 3 red/stale re-grades first, then five bisection diagnostics that
# isolate each suspect term of the two roll-sensitive reds on the
# driver's own roll (operators/diagnostics.py), then 41 entries of the
# queued never-graded batch (subqueries/pivot/agg tail, timeseries,
# fn_url, the LLM mid-family).
GRADE_ORDER: tuple[str, ...] = (
    # 1-3: re-grades — proj_compute (fixed post-r1, stale red),
    # llm_seq_packing (NULL-ordering hardened, red r2+r3),
    # tpch_q12_priority_shipping (nanos-timestamp load generalized, red r3)
    "proj_compute",
    "llm_seq_packing",
    "tpch_q12_priority_shipping",
    # 4-9: bisection diagnostics (llm_token_count grades n_tok per doc —
    # it was already queued; the diag_* probes decompose the rest)
    "diag_documents_identity",
    "llm_token_count",
    "diag_q12_filter_only",
    "diag_q12_join_only",
    "diag_lineitem_ts_epoch",
    "diag_orders_ts_epoch",
    # 10-50: the queued never-graded round-4 batch
    "subq_scalar_select",
    "join_lateral",
    "pivot_segment",
    "unpivot_measures",
    "agg_stats",
    "agg_percentile",
    "agg_string_agg",
    "agg_min_max_by",
    "agg_bool_bit",
    "agg_count_if",
    "agg_collect_set",
    "agg_product",
    "agg_regression",
    "ts_gap_fill",
    "ts_sessionize",
    "ts_rollup_chain",
    "ts_interpolate",
    "ts_ewma",
    "ts_ohlc",
    "fn_url",
    "llm_text_stats",
    "llm_lang_id",
    "llm_quality_score",
    "llm_fingerprint",
    "llm_multimodal_cols",
    "llm_centroid_per_label",
    "llm_incremental_dedup",
    "llm_pipeline_clean",
    "llm_gopher_filters",
    "llm_domain_stats",
    "llm_topk_ngrams",
    "llm_semdedup",
    "llm_dedup_apply",
    "llm_minhash_jaccard_est",
    "llm_curriculum_mix",
    "llm_tfidf_topterms",
    "llm_near_dup_verified",
    "llm_embedding_cosine_dup",
    "llm_bm25",
    "llm_char_entropy",
    "llm_centroid_outliers",
    # ---- ROUND 5 WINDOW (51-100): spillover of the round-4 queue
    # (incl. the two rows-only agg sketches, kept out of the graded
    # window per VERDICT r3 #5 — no_oracle rows burn grading signal),
    # then the round-3 widening batch ----
    "agg_approx_percentile",
    "llm_shard_assign",
    "llm_chunk_split",
    "scan_parquet",
    "fn_string",
    "fn_date",
    "fn_conditional",
    # the round-3 widening batch (all
    # oracle-checked, 5-roll-verified locally) ahead of the weaker-signal
    # tail, then remaining never-graded re-greens.
    "cte_recursive",
    "win_percent_rank_nth",
    "set_union_by_name",
    "fn_try_arith",
    "dq_audit",
    "ts_anomaly_zscore",
    "maintain_zorder",
    "llm_pmi_bigrams",
    "llm_passage_dedup",
    "llm_holdout_split",
    "llm_winnowing",
    "fn_datetime_interval",
    "join_asof_nearest",
    "llm_lm_score",
    "llm_dataset_card",
    "sink_fixedlen_bz2",
    "scan_varlen_rdw",
    "sink_varlen_rdw",
    "scan_varlen_rdw_indexed",
    "scan_fixedlen_comp12",
    "ts_retention_cohorts",
    "ts_funnel",
    "agg_histogram",
    "agg_bitmap_distinct",
    "graph_pagerank",
    "llm_mime_sniff",
    "maintain_varlen_index",
    "stream_varlen_tail",
    "llm_corpus_diff",
    "llm_group_sample",
    "llm_embedding_quantize",
    "sql_varlen_view",
    "scan_varlen_vb",
    "sink_varlen_vb",
    "llm_url_dedup",
    "scan_fixedlen_odo",
    "scan_fixedlen_copybook",
    # agg_hll_mergeable stays LAST of the queued names: still rows-only
    # (engine-specific sketch bytes) — it must not occupy an early slot
    # of a future graded window (VERDICT r3 #5)
    "agg_hll_mergeable",
    # ---- ROUND 6+: streaming + rows-only + already-green tail follows in
    # registration order (streaming last among ungraded: batch-equivalence
    # oracles are the weakest signal per graded slot).
)


def _reorder() -> None:
    """Rebuild QUERIES/ORACLES in GRADE_ORDER (unknown name = typo guard)."""
    missing = [n for n in GRADE_ORDER if n not in QUERIES]
    if missing:
        raise ValueError(f"GRADE_ORDER names not registered: {missing}")
    ordered: dict[str, QueryFn] = {}
    for n in GRADE_ORDER:
        ordered[n] = QUERIES[n]
    for n, fn in QUERIES.items():
        ordered.setdefault(n, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o_ordered)


def load_all() -> None:
    """Import every module that registers queries (idempotent), then
    apply the GRADE_ORDER rotation (see above)."""
    from hadoop_fixedlengthinputformat_spark.sources import (  # noqa: F401
        scan_queries,
    )
    from hadoop_fixedlengthinputformat_spark.functions import (  # noqa: F401
        scalar_queries,
        llm_queries,
        udf_surface,
    )
    from hadoop_fixedlengthinputformat_spark.streaming import (  # noqa: F401
        stream_queries,
    )
    from hadoop_fixedlengthinputformat_spark.operators import (  # noqa: F401
        pivot_stats,
        timeseries,
        tpch_composites,
        projection_filter,
        joins,
        aggregates,
        windows,
        sort_setops,
        subqueries,
        tpch_suite,
    )
    from hadoop_fixedlengthinputformat_spark.functions import (  # noqa: F401
        retrieval_queries,
        quality_extras,
    )
    from hadoop_fixedlengthinputformat_spark.sources import (  # noqa: F401
        observe_queries,
        encoding_queries,
        multitype_queries,
    )
    from hadoop_fixedlengthinputformat_spark.functions import (  # noqa: F401
        url_queries,
    )
    from hadoop_fixedlengthinputformat_spark.sources import (  # noqa: F401
        skip_queries,
    )
    from hadoop_fixedlengthinputformat_spark.streaming import (  # noqa: F401
        stream_extras,
    )
    from hadoop_fixedlengthinputformat_spark.functions import (  # noqa: F401
        tokenizer_queries,
    )
    from hadoop_fixedlengthinputformat_spark.operators import (  # noqa: F401
        relational_extras,
    )
    from hadoop_fixedlengthinputformat_spark.functions import (  # noqa: F401
        corpus_extras,
    )
    from hadoop_fixedlengthinputformat_spark.sources import (  # noqa: F401
        varlen_queries,
    )
    from hadoop_fixedlengthinputformat_spark.operators import (  # noqa: F401
        analytics_extras,
        diagnostics,
    )

    _reorder()
