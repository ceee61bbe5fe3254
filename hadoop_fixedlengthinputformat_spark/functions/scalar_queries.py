"""G family — scalar function families (SURVEY.md §2.3-G).

One query per family, several functions each; everything is a built-in
JVM expression (whole-stage codegen, no Python).  trim+substring+cast is
the heart of fixed-width field decoding (the reference's only projection
is the byte-slice key, FixedLengthRecordReader.java:252-254) — ``fn_cast``
exercises exactly that decode path.

DuckDB dialect notes baked into the oracles: regexp_replace needs the
'g' flag (Spark replaces all matches by default); datediff arg order is
reversed (DuckDB date_diff('day', start, end) == Spark datediff(end,
start)); whitespace token COUNTS use the arithmetic formula
``length(t) - length(replace(t,' ','')) + 1`` on both sides (never
``size(split(..))`` vs ``len(string_split(..))`` — equal on paper, but
the arithmetic form has no regex/array/version surface to drift on);
DuckDB ``to_timestamp`` returns TIMESTAMPTZ, so oracles must
``CAST(... AS TIMESTAMP)`` to match Spark's naive timestamp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.functions.num import snap
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_up,
           lower(c_mktsegment) AS seg_lo,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_pre,
           concat(c_name, '-', c_mktsegment) AS name_seg,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
           replace(c_mktsegment, 'E', '_') AS seg_repl,
           trim(concat('  ', c_name, '  ')) AS name_trim
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_pre"),
        F.concat("c_name", F.lit("-"), "c_mktsegment").alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.replace("c_mktsegment", F.lit("E"), F.lit("_")).alias("seg_repl"),
        F.trim(F.concat(F.lit("  "), "c_name", F.lit("  "))).alias("name_trim"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_add(od, 30).alias("due_date"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT c_custkey,
           floor(abs(c_acctbal - 500) * 10000 + 0.5) / 10000 AS dist_500,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           floor(pow(2, c_nationkey % 5) * 10000 + 0.5) / 10000 AS pow2,
           floor((floor(ln(c_acctbal + 1000) * 100000000 + 0.5) / 100000000)
                 * 10000 + 0.5) / 10000 AS log_bal,
           floor(greatest(c_acctbal, 0.0) * 10000 + 0.5) / 10000 AS bal_pos,
           floor(least(c_acctbal, 0.0) * 10000 + 0.5) / 10000 AS bal_neg,
           (c_nationkey % 7 + 7) % 7 AS key_mod
    FROM customer
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row double rounding uses snap (floor-trick), never round():
    round-1/2 lesson — engines disagree on round() ties, and the driver
    hash needs bit-identical doubles.  ln (transcendental, last-ulp
    engine divergence) is snapped to 8 decimals before the final snap."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        snap(F.abs(bal - 500), 4).alias("dist_500"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        snap(F.pow(F.lit(2), F.col("c_nationkey") % 5), 4).alias("pow2"),
        snap(snap(F.log(bal + 1000), 8), 4).alias("log_bal"),
        snap(F.greatest(bal, F.lit(0.0)), 4).alias("bal_pos"),
        snap(F.least(bal, F.lit(0.0)), 4).alias("bal_neg"),
        F.pmod(F.col("c_nationkey"), F.lit(7)).alias("key_mod"),
    )


@query(
    "fn_trig",
    oracle="""
    SELECT c_custkey,
           floor(floor(sin(radians(c_nationkey * 7.0)) * 100000000 + 0.5)
                 / 100000000 * 10000 + 0.5) / 10000 + 0 AS sin_angle,
           floor(floor(cos(c_acctbal / 1000.0) * 100000000 + 0.5)
                 / 100000000 * 10000 + 0.5) / 10000 + 0 AS cos_bal,
           floor(floor(atan2(c_acctbal, 1000.0) * 100000000 + 0.5)
                 / 100000000 * 10000 + 0.5) / 10000 + 0 AS atan2_bal,
           floor(floor(atan(c_nationkey / 7.0) * 100000000 + 0.5)
                 / 100000000 * 10000 + 0.5) / 10000 AS atan_key
    FROM customer
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric family (sin/cos/atan2/atan/radians) — transcendental
    outputs differ between libm implementations in the last ulp (and
    radians/degrees even associate their pi constant differently), so
    every value snaps to 8 decimals straight out of the function before
    the 4-decimal output snap — the same rule as ln in fn_math.  The +0
    normalizes IEEE -0.0 where a snapped negative value rounds to
    zero."""
    c = load_table(spark, sf_dir, "customer")

    def t(col):
        return snap(snap(col, 8), 4)

    return c.select(
        "c_custkey",
        (t(F.sin(F.radians(F.col("c_nationkey") * 7.0))) + F.lit(0.0)).alias(
            "sin_angle"
        ),
        (t(F.cos(F.col("c_acctbal") / 1000.0)) + F.lit(0.0)).alias("cos_bal"),
        (t(F.atan2(F.col("c_acctbal"), F.lit(1000.0))) + F.lit(0.0)).alias(
            "atan2_bal"
        ),
        t(F.atan(F.col("c_nationkey") / 7.0)).alias("atan_key"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_nationkey % 2 = 0 THEN c_custkey ELSE NULL END AS even_key
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("rich").alias(
            "bal_bucket"
        ),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_custkey"))
        .otherwise(F.lit(None))
        .alias("even_key"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS BIGINT) AS cust_roundtrip,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
    FROM orders
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-width decode path: zero-padded string -> int, timestamp ->
    date -> ISO string (cf. sources/layout.py which does this per field)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.lpad(F.col("o_custkey").cast("string"), 8, "0")
        .cast("bigint")
        .alias("cust_roundtrip"),
        F.floor("o_totalprice").alias("price_floor"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
               AS first3_sorted,
           list_contains(string_split(text, ' '), 'spark') AS has_spark
    FROM documents WHERE doc_id < 50
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    dtoks = F.array_distinct(toks)
    from hadoop_fixedlengthinputformat_spark.functions import text as text_fns

    return d.select(
        "doc_id",
        text_fns.n_ws_tokens("text").alias("n_tokens"),
        F.size(dtoks).alias("n_distinct"),
        F.array_join(F.slice(F.sort_array(dtoks), 1, 3), ",").alias("first3_sorted"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@query(
    "fn_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 20
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "fn_map",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS seg_val,
           CAST(c_nationkey AS VARCHAR) AS nat_val,
           2 AS n_keys
    FROM customer
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + element_at/map_keys; the oracle states the
    expected scalar values directly (DuckDB MAP literals aren't needed to
    verify the lookup semantics)."""
    c = load_table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("seg"),
        F.col("c_mktsegment"),
        F.lit("nat"),
        F.col("c_nationkey").cast("string"),
    )
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg_val"),
        F.element_at(m, "nat").alias("nat_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    k_int = F.from_json("props", "k INT").getField("k")
    return ev.select(
        "event_id",
        k_str.alias("k_str"),
        k_int.alias("k_int"),
        (k_int % 10).alias("k_mod"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel,
           regexp_matches(p_name, 'ro') AS has_ro,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family — JVM-side codegen regexps (never a Python UDF).
    Dialect note: Spark regexp_replace replaces all matches; DuckDB needs
    the explicit 'g' flag to agree."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", r"[AEIOU]", "_").alias("devowel"),
        F.col("p_name").rlike("ro").alias("has_ro"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS cust_from_struct,
           round(o_totalprice, 4) AS price_from_struct,
           o_orderstatus AS status_from_struct
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType round-trip: bundle columns into a struct, project fields
    back out.  Catalyst collapses the create/extract pair (CreateNamedStruct
    + GetStructField fold to the raw column), so the nested hop is free —
    verify: the plan reads the three source columns only."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("cust"),
        F.round("o_totalprice", 4).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return o.select(
        "o_orderkey",
        s.getField("cust").alias("cust_from_struct"),
        s.getField("price").alias("price_from_struct"),
        s.getField("status").alias("status_from_struct"),
    )


@query(
    "fn_sequence",
    oracle="""
    SELECT n_nationkey, unnest(generate_series(1, n_nationkey % 3 + 1)) AS i
    FROM nation
    """,
)
def fn_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation: sequence + explode (Spark) vs generate_series+unnest
    (DuckDB) — the generator expansion runs inside codegen, no shuffle."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.explode(
            F.sequence(F.lit(1), F.col("n_nationkey") % 3 + 1)
        ).alias("i"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 7 AS or7,
           xor(l_orderkey, l_linenumber) AS xored,
           l_orderkey << 2 AS shifted,
           bit_count(l_orderkey) AS pop
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — and/or/xor/shift/popcount (codegen JVM exprs;
    simhash and LSH bucketing build on exactly these)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(7)).alias("or7"),
        k.bitwiseXOR(F.col("l_linenumber")).alias("xored"),
        F.shiftleft(k, 2).alias("shifted"),
        F.bit_count(k).alias("pop"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           md5(concat(COALESCE(lang, ''), '|', COALESCE(source, ''))) AS meta_md5,
           length(md5(text)) AS digest_len
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family over documents — md5 is the cross-engine-stable digest
    (exact dedup and minhash build on it; xxhash64/sha2 exist Spark-side
    but have no DuckDB twin, so the oracle pins md5)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        # NULL-proof: DuckDB concat skips NULLs, Spark yields NULL —
        # coalesce pins one semantics on both sides
        F.md5(
            F.concat(
                F.coalesce("lang", F.lit("")),
                F.lit("|"),
                F.coalesce("source", F.lit("")),
            )
        ).alias("meta_md5"),
        F.length(F.md5("text")).alias("digest_len"),
    )


@query(
    "fn_string_extras",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, 'Brand#33') AS brand_dist,
           reverse(p_brand) AS brand_rev,
           repeat(substr(p_type, 1, 2), 3) AS type_rep,
           translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
           base64(CAST(p_brand AS BLOB)) AS brand_b64,
           hex(CAST(p_partkey AS VARCHAR)) AS key_hex
    FROM part
    """,
)
def fn_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance + encoding family.  levenshtein is the exact-verify
    step behind fuzzy dedup candidates (minhash/simhash propose, edit
    distance confirms); base64/hex are the binary-column bridges the
    multimodal path uses."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", F.lit("Brand#33")).alias("brand_dist"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("type_rep"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.base64(F.col("p_brand").cast("binary")).alias("brand_b64"),
        F.hex(F.col("p_partkey").cast("string")).alias("key_hex"),
    )


@query(
    "fn_epoch",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP)
               AS ts_roundtrip,
           CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch
    FROM events
    """,
)
def fn_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch seconds round trip (UTC session pins the conversion)."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        F.from_unixtime(epoch_s).cast("timestamp").alias("ts_roundtrip"),
        F.unix_timestamp(F.date_trunc("day", "ts").cast("timestamp")).alias(
            "day_epoch"
        ),
    )


@query(
    "fn_array_lambda",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           array_to_string(list_transform(toks, x -> upper(x)), ' ') AS upper_text,
           len(list_filter(toks, x -> length(x) > 5)) AS n_long,
           list_reduce(list_transform(toks, x -> length(x)), (a, b) -> a + b)
               AS total_chars,
           len(list_filter(toks, x -> x = 'the')) > 0 AS has_the
    FROM t
    """,
)
def fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (lambda expressions): transform /
    filter / aggregate / exists — JVM-interpreted per element, so fine
    for short arrays; for hot million-element arrays prefer explode +
    codegen aggregation (measured 8x for minhash, plans/NOTES.md)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(F.transform(toks, lambda x: F.upper(x)), " ").alias(
            "upper_text"
        ),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(toks, lambda x: x == F.lit("the")).alias("has_the"),
    )


@query(
    "fn_struct_withfield",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS cust,
           floor(o_totalprice * 1.1 * 10000 + 0.5) / 10000 AS adjusted,
           o_orderstatus AS status
    FROM orders
    """,
)
def fn_struct_withfield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct surgery: withField adds/replaces a field inside a
    struct, dropFields removes one — in-place nested updates without
    rebuilding the struct (Catalyst folds the chain; the plan reads the
    source columns only)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    upd = (
        s.withField("adjusted", snap(F.col("o_totalprice") * 1.1, 4))
        .dropFields("price")
    )
    return o.select(
        "o_orderkey",
        upd.getField("cust").alias("cust"),
        upd.getField("adjusted").alias("adjusted"),
        upd.getField("status").alias("status"),
    )


@query(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           format('{:.2f}', o_totalprice) AS price_fmt,
           printf('%d/%s', o_orderkey, o_orderstatus) AS key_status,
           concat(CAST(round(o_totalprice / 1000, 0) AS INT), 'k') AS price_k
    FROM orders
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting family (format_string == printf-style)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("%.2f", "o_totalprice").alias("price_fmt"),
        F.format_string("%d/%s", "o_orderkey", "o_orderstatus").alias(
            "key_status"
        ),
        F.concat(
            F.round(F.col("o_totalprice") / 1000, 0).cast("int").cast("string"),
            F.lit("k"),
        ).alias("price_k"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS INT) AS missing,
           CAST(json(props) AS VARCHAR) AS round_trip
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType: ``parse_json`` into an open semi-structured
    value, path access via ``try_variant_get`` (missing path -> NULL, no
    error), normalized re-serialization via ``to_json``.  The modern
    replacement for schema-up-front ``from_json`` when 100 TB of props
    don't share one schema — variant keeps the binary-encoded value
    columnar and pushdown-friendly.  DuckDB's ``json()`` normalization
    matches ``to_json(parse_json(...))`` byte-for-byte on this corpus."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.missing", "int").alias("missing"),
        F.to_json(v).alias("round_trip"),
    )


@query(
    "fn_sql_udf",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS tier,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END = 'high' AS is_high
    FROM orders
    """,
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDF (CREATE FUNCTION ... RETURN <expr>): a DECLARATIVE
    user function — the body is a Catalyst expression, so unlike Python
    UDFs it inlines into codegen, participates in constant folding and
    predicate pushdown, and costs nothing at 100 TB.  The right first
    choice for any UDF expressible as SQL."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'low'
                    WHEN p < 150000 THEN 'mid'
                    ELSE 'high' END
        """
    )
    o = load_table(spark, sf_dir, "orders")
    tier = F.expr("price_tier(o_totalprice)")
    return o.select(
        "o_orderkey",
        tier.alias("tier"),
        (tier == "high").alias("is_high"),
    )


@query(
    "fn_xml",
    oracle="""
    SELECT o_orderkey, o_orderkey AS parsed_key,
           o_orderstatus AS parsed_status,
           o_orderkey AS xpath_key
    FROM orders
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface: rows serialized to XML strings, then recovered BOTH
    ways — schema-full ``from_xml`` (struct out) and Hive-style
    ``xpath_int`` path extraction.  The oracle states the round-trip
    law (parse(serialize(row)) == row), the same invariant style as the
    fixedlen round-trip tests.  Pure per-row JVM exprs, zero shuffle."""
    o = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<r><k>"),
        F.col("o_orderkey"),
        F.lit("</k><s>"),
        F.col("o_orderstatus"),
        F.lit("</s></r>"),
    )
    parsed = F.from_xml(xml, "k BIGINT, s STRING")
    return o.select(
        "o_orderkey",
        parsed.getField("k").alias("parsed_key"),
        parsed.getField("s").alias("parsed_status"),
        F.xpath_long(xml, F.lit("/r/k")).alias("xpath_key"),
    )



@query(
    "fn_ip",
    oracle="""
    WITH ips AS (
        SELECT c_custkey,
               CAST(1 + c_custkey % 223 AS BIGINT) AS o1,
               CAST((c_custkey // 3) % 256 AS BIGINT) AS o2,
               CAST((c_custkey // 7) % 256 AS BIGINT) AS o3,
               CAST(c_custkey % 256 AS BIGINT) AS o4
        FROM customer
    ),
    strung AS (
        SELECT c_custkey,
               o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip
        FROM ips
    ),
    parsed AS (
        SELECT c_custkey, ip,
               CAST(string_split(ip, '.')[1] AS BIGINT) AS p1,
               CAST(string_split(ip, '.')[2] AS BIGINT) AS p2,
               CAST(string_split(ip, '.')[3] AS BIGINT) AS p3,
               CAST(string_split(ip, '.')[4] AS BIGINT) AS p4
        FROM strung
    )
    SELECT c_custkey, ip,
           p1 * 16777216 + p2 * 65536 + p3 * 256 + p4 AS ip_num,
           p1 || '.' || p2 || '.' || p3 || '.0/24' AS subnet_24,
           (p1 = 10 OR (p1 = 172 AND p2 BETWEEN 16 AND 31)
               OR (p1 = 192 AND p2 = 168)) AS is_private
    FROM parsed
    """,
)
def fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address functions — the network-log staple the engine's
    scalar family was missing: dotted-quad synthesis (from custkey
    arithmetic so the oracle derives identical addresses), octet PARSE
    back out of the string, 32-bit numeric form (the sortable/range-
    joinable representation), /24 subnet bucketing, and RFC-1918
    private-range classification.  Pure per-row codegen expressions —
    split/casts/concat — zero shuffle, zero UDF."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ips = c.select(
        "c_custkey",
        (1 + k % 223).cast("long").alias("o1"),
        # integer division via `div` (CLAUDE.md: never CAST(a/b AS
        # BIGINT) — DuckDB // floors, double-cast truncates)
        (F.expr("c_custkey div 3") % 256).cast("long").alias("o2"),
        (F.expr("c_custkey div 7") % 256).cast("long").alias("o3"),
        (k % 256).cast("long").alias("o4"),
    )
    strung = ips.select(
        "c_custkey",
        F.concat_ws(".", "o1", "o2", "o3", "o4").alias("ip"),
    )
    oct_ = lambda i: F.element_at(F.split(F.col("ip"), "[.]"), i).cast("long")
    parsed = strung.select(
        "c_custkey", "ip",
        oct_(1).alias("p1"), oct_(2).alias("p2"),
        oct_(3).alias("p3"), oct_(4).alias("p4"),
    )
    return parsed.select(
        "c_custkey",
        "ip",
        (
            F.col("p1") * 16777216 + F.col("p2") * 65536
            + F.col("p3") * 256 + F.col("p4")
        ).alias("ip_num"),
        F.concat(
            F.col("p1").cast("string"), F.lit("."),
            F.col("p2").cast("string"), F.lit("."),
            F.col("p3").cast("string"), F.lit(".0/24"),
        ).alias("subnet_24"),
        (
            (F.col("p1") == 10)
            | ((F.col("p1") == 172) & F.col("p2").between(16, 31))
            | ((F.col("p1") == 192) & (F.col("p2") == 168))
        ).alias("is_private"),
    )


@query(
    "fn_geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               CAST(c_custkey % 120 AS DOUBLE) - 60.0 + 0.25 AS lat1,
               CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.25 AS lon1,
               CAST((c_nationkey * 7) % 120 AS DOUBLE) - 60.0 AS lat2,
               CAST((c_nationkey * 13) % 360 AS DOUBLE) - 180.0 AS lon2
        FROM customer
        WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
    ),
    t AS (
        SELECT c_custkey, lat1, lon1, lat2, lon2,
               floor(sin(radians((lat2 - lat1) / 2.0)) * 100000000 + 0.5)
                   / 100000000 AS s_dlat,
               floor(sin(radians((lon2 - lon1) / 2.0)) * 100000000 + 0.5)
                   / 100000000 AS s_dlon,
               floor(cos(radians(lat1)) * 100000000 + 0.5)
                   / 100000000 AS c1,
               floor(cos(radians(lat2)) * 100000000 + 0.5)
                   / 100000000 AS c2
        FROM pts
    ),
    h AS (
        SELECT c_custkey, lat1, lon1, lat2, lon2,
               floor(sqrt(s_dlat * s_dlat + (c1 * c2)
                          * (s_dlon * s_dlon)) * 100000000 + 0.5)
                   / 100000000 AS root
        FROM t
    )
    SELECT c_custkey,
           floor((12742.0
                  * (floor(asin(CASE WHEN root > 1.0 THEN 1.0
                                     ELSE root END) * 100000000 + 0.5)
                     / 100000000)) * 10000 + 0.5) / 10000 + 0
               AS hav_km,
           (lat2 BETWEEN lat1 - 30.0 AND lat1 + 30.0)
               AND (lon2 BETWEEN lon1 - 45.0 AND lon1 + 45.0) AS in_bbox
    FROM h
    """,
)
def fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial scalar family: great-circle (haversine) distance and a
    bounding-box predicate over key-derived coordinates (the tables
    carry no geo columns, so both engines synthesize identical exact
    doubles from integer keys).  Transcendental determinism follows the
    fn_trig rule with one addition: haversine COMPOSES transcendentals
    (sin → sqrt → asin), so every stage snaps to 8 decimals before
    feeding the next — sin half-angles, cosines, the sqrt, and the
    asin — making the intermediate values bit-identical on both
    engines rather than hoping four chained ulp errors cancel.  The
    root is clamped to 1.0 before asin (antipodal rounding overflow).
    2R = 12742 km; final distance snapped to 4.  The bbox predicate
    compares exact integer-derived doubles — no snapping needed.
    Single projection, zero exchanges; at 100 TB this is a codegen
    row-expression scan."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey").isNotNull() & F.col("c_nationkey").isNotNull()
    )
    lat1 = (F.col("c_custkey") % 120).cast("double") - 60.0 + 0.25
    lon1 = (F.col("c_custkey") % 360).cast("double") - 180.0 + 0.25
    lat2 = ((F.col("c_nationkey") * 7) % 120).cast("double") - 60.0
    lon2 = ((F.col("c_nationkey") * 13) % 360).cast("double") - 180.0
    s_dlat = snap(F.sin(F.radians((lat2 - lat1) / 2.0)), 8)
    s_dlon = snap(F.sin(F.radians((lon2 - lon1) / 2.0)), 8)
    c1 = snap(F.cos(F.radians(lat1)), 8)
    c2 = snap(F.cos(F.radians(lat2)), 8)
    root = snap(
        F.sqrt(s_dlat * s_dlat + (c1 * c2) * (s_dlon * s_dlon)), 8
    )
    hav = 12742.0 * snap(
        F.asin(F.when(root > 1.0, F.lit(1.0)).otherwise(root)), 8
    )
    return c.select(
        "c_custkey",
        (snap(hav, 4) + F.lit(0.0)).alias("hav_km"),
        (
            lat2.between(lat1 - 30.0, lat1 + 30.0)
            & lon2.between(lon1 - 45.0, lon1 + 45.0)
        ).alias("in_bbox"),
    )


def _letter_presence_terms(a: str, b: str, op: str) -> str:
    """SQL for the 26-letter set cardinality shared verbatim by both
    engines: Σ CASE WHEN contains(a,ch) <op> contains(b,ch) — presence
    over a FIXED alphabet avoids split-to-char-array semantics, which
    differ across engines (Spark's split('', ...) emits a trailing
    empty token; DuckDB's doesn't)."""
    terms = [
        f"(CASE WHEN contains({a}, '{c}') {op} contains({b}, '{c}')"
        f" THEN 1 ELSE 0 END)"
        for c in "abcdefghijklmnopqrstuvwxyz"
    ]
    return "(" + " + ".join(terms) + ")"


_SSIM_INTER = _letter_presence_terms("lower(p_name)", "lower(p_type)", "AND")
_SSIM_UNION = _letter_presence_terms("lower(p_name)", "lower(p_type)", "OR")
_SSIM_LEV_SIM = (
    "floor((1.0 - CAST(lev AS DOUBLE)"
    " / CAST(greatest(length(p_name), length(p_type), 1) AS DOUBLE))"
    " * 10000 + 0.5) / 10000"
)
_SSIM_JAC = (
    "floor((CAST(inter AS DOUBLE) / CAST(greatest(uni, 1) AS DOUBLE))"
    " * 10000 + 0.5) / 10000"
)


@query(
    "fn_string_similarity",
    oracle=f"""
    WITH base AS (
        SELECT p_partkey, p_name, p_type,
               levenshtein(p_name, p_type) AS lev,
               CAST({_SSIM_INTER} AS INTEGER) AS inter,
               CAST({_SSIM_UNION} AS INTEGER) AS uni
        FROM part
        WHERE p_name IS NOT NULL AND p_type IS NOT NULL
    )
    SELECT p_partkey, lev,
           {_SSIM_LEV_SIM} + 0 AS lev_sim,
           inter, uni,
           {_SSIM_JAC} + 0 AS letter_jaccard
    FROM base
    """,
)
def fn_string_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise string-similarity metrics between two live columns
    (part name vs type) — the exact-verify toolkit behind fuzzy joins:
    Levenshtein distance (native on both engines), its normalized
    similarity 1 − lev/max(len) and the character-SET Jaccard over the
    fixed a–z alphabet.  The alphabet formulation is deliberate:
    26 contains() presence terms are pure codegen and engine-identical,
    where split-to-char-array semantics differ (Spark's split
    emits a trailing empty token DuckDB doesn't).  Per-row projection,
    zero shuffles — streams at scan speed at any scale.  NULL operands
    excluded on BOTH sides (round-4 per-char rule); ratios divide by
    greatest(·, 1)."""
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").isNotNull() & F.col("p_type").isNotNull()
    )
    base = p.select(
        "p_partkey",
        "p_name",
        "p_type",
        F.levenshtein("p_name", "p_type").alias("lev"),
        F.expr(_SSIM_INTER).cast("int").alias("inter"),
        F.expr(_SSIM_UNION).cast("int").alias("uni"),
    )
    return base.select(
        "p_partkey",
        "lev",
        (F.expr(_SSIM_LEV_SIM) + F.lit(0.0)).alias("lev_sim"),
        "inter",
        "uni",
        (F.expr(_SSIM_JAC) + F.lit(0.0)).alias("letter_jaccard"),
    )
