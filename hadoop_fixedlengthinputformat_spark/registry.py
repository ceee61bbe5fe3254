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
# ROUND 9 WINDOW (this list's first 50), per VERDICT r8 #1/#5.  Two
# goals: (a) close ever-graded coverage to 340/340 — the 5 names the r8
# round left as the only never-driver-graded queries lead the window;
# (b) start the rolling FRESHNESS RE-GRADE policy (VERDICT r8 #5): 186
# of the current greens date from r1–r4, before the round-5/6/7/8
# determinism rule waves, so each window back-fills its free slots with
# the OLDEST-grade greens.  Staleness rule (enforced by
# tests/test_registry_order.py::test_window_regrades_only_known_reds):
# a green may re-enter the window once its last grade is >= 5 rounds
# behind the upcoming round.  At r9 that admits the r1 vintage (48
# names); this window takes 45 of them (the relational core: filters,
# joins, aggregates, windows, setops, subqueries), leaving 3 r1 + the
# r2 vintage for the r10 window.  Every op therefore re-proves itself
# under the current determinism rules within ~4 windows.
GRADE_ORDER: tuple[str, ...] = (
    # --- never-driver-graded backlog (VERDICT r8 #1) ---
    "llm_repeated_ngrams",
    "agg_count_min",
    "stream_approx_distinct",
    "scan_fixedlen_julian",
    "ts_theil_sen_recent",
    # --- r1-vintage freshness re-grades (VERDICT r8 #5) ---
    "agg_global",
    "agg_groupby_hash",
    "agg_count_distinct",
    "agg_distinct_rows",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "filter_compare",
    "filter_between_and",
    "filter_in_or_not",
    "filter_null",
    "filter_like",
    "proj_select",
    "join_inner_hash",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta_range",
    "join_sort_merge",
    "join_asof",
    "join_skew_salted",
    "join_bucketed",
    "join_null_safe",
    "limit_topk",
    "sort_multi_key",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_except_all",
    "set_intersect_all",
    "subq_scalar_where",
    "subq_in_where",
    "subq_exists_correlated",
    "subq_not_exists",
    "topk_per_group",
    "win_row_number",
    "win_rank_dense",
    "win_lag_lead",
    "win_running_sum",
    "win_range_frame",
    "win_ntile_first_last",
    "win_cume_dist",
    "win_range_interval",
)
# The window is GRADE_ORDER[:50]: the 5-name backlog + 45 vintage
# re-grades.  GRADE_ORDER[50:53] (win_ntile_first_last, win_cume_dist,
# win_range_interval) are the r10 window head; the r2 vintage (fn_*
# scalar family, scans/sinks, LLM head — 46 names) fills the rest of
# r10 under the same staleness rule.


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
