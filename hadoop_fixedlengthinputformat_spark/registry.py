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
# Grading history: r4 greened 44/50; its 6 reds all shared the DuckDB
# HUGEINT output-type root cause (VERDICT r4), fixed this round by
# CASTing the oracle sums AS BIGINT + the tests/test_oracle_types.py
# gate.
#
# ROUND 8 WINDOW (this list's first 50), per VERDICT r7 #1: the r7
# window went 50/50 green, so every formerly-listed name drops out of
# GRADE_ORDER (green names fall back to registration order — re-grading
# them wastes slots, gated by test_window_regrades_only_known_reds).
# What remains is exactly the 54-name never-graded backlog: the second
# half of the stats family, the varlen D/DB pair, sorted scan/sink,
# tolerance asof, zonedl, then the 13 ops that gained oracles in round
# 7 (sketch gates, ANN structural gates, multimodal
# construction-predicted fixtures, BPE invariants, watermark exact
# oracle) — first-ever driver evidence for them.  Positions 51-54 are
# the r9 window head (VERDICT r7 #4): after this round they are the
# ONLY queries never driver-graded.
GRADE_ORDER: tuple[str, ...] = (
    "agg_mannwhitney",
    "agg_ks_test",
    "maintain_gdg_expire",
    "ts_cusum_changepoint",
    "scan_fixedlen_redefines",
    "ts_autocorr",
    "agg_cramers_v",
    "join_asof_forward",
    "pipeline_tape_to_corpus",
    "agg_kruskal",
    "agg_jarque_bera",
    # round-6 widening: the fixed-class ANOVA family + info/DQ stats
    "agg_anova",
    "agg_levene",
    "agg_entropy",
    "agg_benford",
    "ts_bollinger",
    "ts_rsi",
    "llm_zipf_fit",
    "llm_dedup_bloom",
    "scan_varlen_db",
    "sink_varlen_db",
    "scan_fixedlen_sorted",
    "sink_fixedlen_sorted",
    "agg_hhi",
    "ts_dow_profile",
    "llm_hash_features",
    "llm_quality_classifier",
    "ts_survival_km",
    "llm_length_histogram",
    "join_asof_tolerance",
    "fn_uuid",
    "dq_freshness",
    # round-6 session-2 widening: association/agreement/effect-size
    # statistics (exact-integer recipes)
    "agg_cohen_kappa",
    "agg_kendall_tau",
    "agg_cohens_d",
    "agg_corr_matrix",
    "ts_theil_sen",
    "scan_fixedlen_zonedl",
    # the formerly rows-only ops, driver-gradeable since round 7
    # (VERDICT r6 #2/#3 recipes — see each query's docstring)
    "stream_watermark_late_drop",
    "agg_hll_mergeable",
    "llm_tokenizer_apply",
    "mm_video_frames",
    "llm_bpe_train",
    "llm_kmeans_train",
    "llm_knn_ivf",
    "llm_knn_pq",
    "llm_cosine_lsh",
    "mm_image_features",
    "mm_audio_frames",
    "mm_image_resize",
    # round-7 widening (r9 window candidates)
    "llm_repeated_ngrams",
    "agg_count_min",
    "stream_approx_distinct",
    "scan_fixedlen_julian",
    # round-8 widening: the bounded-look-back Theil-Sen the sf1 soak
    # showed the full-history estimator needs at scale
    "ts_theil_sen_recent",
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
    from hadoop_fixedlengthinputformat_spark.sources import (  # noqa: F401
        asa_queries,
    )
    from hadoop_fixedlengthinputformat_spark.functions import (  # noqa: F401
        curation_extras,
    )
    from hadoop_fixedlengthinputformat_spark.sources import (  # noqa: F401
        gdg_queries,
        tape_queries,
    )
    from hadoop_fixedlengthinputformat_spark.operators import (  # noqa: F401
        stats_extras,
    )

    _reorder()
