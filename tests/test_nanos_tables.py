"""tables.load_table must decode TIMESTAMP(NANOS) for EVERY table and
column, not just events.ts (VERDICT r3 "What's wrong" #3: with
``nanosAsLong=true`` set globally, any other nanos column silently
arrives as epoch-nanos bigint and every date filter on it misbehaves
while DuckDB reads real timestamps)."""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hadoop_fixedlengthinputformat_spark.tables import _nanos_cols, load_table


def _write(tmp_path, name, table):
    pq.write_table(table, os.path.join(str(tmp_path), f"{name}.parquet"))


def test_nanos_cols_reads_footer(tmp_path):
    ts = np.array(["2020-01-02T03:04:05"], dtype="datetime64[ns]")
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_shipdate": pa.array(ts),
        "l_commitdate": pa.array(ts.astype("datetime64[us]")),
    }))
    path = os.path.join(str(tmp_path), "lineitem.parquet")
    assert _nanos_cols(path) == ["l_shipdate"]


def test_nanos_cols_handles_directory_and_missing(tmp_path):
    d = tmp_path / "dir.parquet"
    d.mkdir()
    ts = np.array(["2021-06-01T00:00:00"], dtype="datetime64[ns]")
    pq.write_table(
        pa.table({"ts": pa.array(ts)}), str(d / "part-0.parquet")
    )
    assert _nanos_cols(str(d)) == ["ts"]
    assert _nanos_cols(str(tmp_path / "nope.parquet")) == []


def test_load_table_converts_every_nanos_column(spark, tmp_path):
    ship = np.array(
        ["1996-03-15T00:00:00", "1997-11-30T12:34:56"], dtype="datetime64[ns]"
    )
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_shipdate": pa.array(ship),
    }))
    df = load_table(spark, str(tmp_path), "lineitem")
    assert dict(df.dtypes)["l_shipdate"] == "timestamp_ntz"
    rows = {r.l_orderkey: r.l_shipdate for r in df.collect()}
    assert rows[1] == datetime.datetime(1996, 3, 15)
    assert rows[2] == datetime.datetime(1997, 11, 30, 12, 34, 56)


def test_load_table_leaves_plain_bigint_alone(spark, tmp_path):
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([7], pa.int64()),
        "o_orderdate": pa.array(
            np.array(["1995-01-01"], dtype="datetime64[us]")
        ),
    }))
    df = load_table(spark, str(tmp_path), "orders")
    # micros column arrives as a real timestamp without conversion and
    # the genuinely-integer key stays bigint
    assert dict(df.dtypes)["o_orderkey"] == "bigint"
    assert dict(df.dtypes)["o_orderdate"].startswith("timestamp")
