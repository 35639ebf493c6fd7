"""Adversarial relational probe: boundary and referential-integrity cases
the TPC-H-ish testdata never exercises, checked value-for-value against the
DuckDB oracles.

Cases planted: orders whose o_custkey has no customer row (inner-join drop
semantics), lineitems with unknown suppliers, events exactly at the 30-min
session gap and exactly at the 1-hour sliding-window edge, a lineitem
shipped exactly at the Q1 cutoff timestamp, order prices landing exactly on
a .5 cent (half-away vs half-even rounding), and single-event users.
"""
from __future__ import annotations

import datetime as dt
import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_QUERIES = [
    "orders_by_nation", "top_spenders", "pricing_summary",
    "revenue_by_region", "segment_order_revenue", "top_orders_per_segment",
    "value_bands", "sessions", "sliding_window", "events_hourly",
    "asof_last_order", "entities_by_nation",
]

_T0 = dt.datetime(1995, 6, 1, 12, 0, 0)


def _ts(minutes: float):
    return _T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def probe_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rel_probe"))

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": ["ALPHA", "BETA"],
    }), os.path.join(d, "region.parquet"))

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": ["AAA", "BBB", "CCC"],
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    }), os.path.join(d, "nation.parquet"))

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": [f"c{i}" for i in range(4)],
        "c_nationkey": pa.array([0, 1, 2, 0], pa.int32()),
        "c_acctbal": [10.0, 20.0, 30.0, 40.0],
        "c_mktsegment": ["BUILDING", "AUTOMOBILE", "BUILDING", "MACHINERY"],
    }), os.path.join(d, "customer.parquet"))

    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": ["s1", "s2"],
        "s_nationkey": pa.array([0, 2], pa.int32()),
        "s_acctbal": [5.0, 6.0],
    }), os.path.join(d, "supplier.parquet"))

    # order 999 -> unknown customer 99 (must DROP from joins);
    # prices exactly on .5 cents: 100.005 * 100 = 10000.5
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 999], pa.int64()),
        "o_custkey": pa.array([1, 2, 3, 1, 99], pa.int64()),
        "o_orderstatus": ["F"] * 5,
        "o_totalprice": [100.005, 250.0, 0.125, 99.995, 1e6],
        "o_orderdate": [_ts(-60 * 24 * i) for i in range(5)],
        "o_orderpriority": ["1-URGENT"] * 5,
    }), os.path.join(d, "orders.parquet"))

    # lineitem for order 999 (unknown customer upstream) and supplier 77
    # (unknown -> revenue_by_region must drop); shipdate exactly at the Q1
    # cutoff TIMESTAMP '1998-09-01' (<= boundary)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12, 999, 13], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 77, 2, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1, 1, 1], pa.int32()),
        "l_quantity": [1.0, 2.0005, 3.0, 4.0, 5.0, 6.0],
        "l_extendedprice": [10.005, 20.0, 30.0, 40.0, 50.0, 60.0],
        "l_discount": [0.0, 0.05, 0.1, 0.0, 0.5, 0.25],
        "l_tax": [0.0] * 6,
        "l_returnflag": ["N", "N", "R", "A", "N", "R"],
        "l_linestatus": ["O", "F", "O", "F", "O", "F"],
        "l_shipdate": [dt.datetime(1998, 9, 1), dt.datetime(1998, 9, 1, 0, 0, 1),
                       dt.datetime(1995, 1, 1), dt.datetime(1996, 1, 1),
                       dt.datetime(1997, 1, 1), dt.datetime(1998, 8, 31)],
    }), os.path.join(d, "lineitem.parquet"))

    # user 1: gap EXACTLY 30min (boundary: > 30min starts a session, == does
    # not), then 30min+1s (new session); user 2: single event; user 3:
    # events exactly 1h apart (RANGE window includes the == boundary)
    # event 8 carries null event_type AND null value: the hourly rollup
    # must keep it as the '' group with 0 contribution (pandas would
    # silently drop a NaN group key; SQL keeps NULL).  User 7 has NO orders
    # at all and user 4's only order is AFTER its event — both exercise the
    # as-of join's unmatched branch (the shipped testdata never does).
    # event 11: user 2 BEFORE its only order (order exists, but later)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(1, 12)), pa.int64()),
        "ts": [_ts(0), _ts(30), _ts(60.02), _ts(0),
               _ts(0), _ts(60), _ts(120), _ts(5),
               _ts(-60 * 24 * 30), _ts(10), _ts(-60 * 24 * 10)],
        "user_id": pa.array([1, 1, 1, 2, 3, 3, 3, 2, 4, 7, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "c", "a", "a", "b", None,
                                "a", "b", "c"]),
        "value": pa.array([1.0005, 2.0, 3.0, 4.0, 5.0, 6.0005, 7.0, None,
                           8.0, 9.0, 10.0], pa.float64()),
        "props": ["{}"] * 11,
    }), os.path.join(d, "events.parquet"))

    yield d
    shutil.rmtree(d, ignore_errors=True)


def _value_rows(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_relational_query_matches_oracle_on_boundaries(ray_session, probe_dir, name):
    import pandas as pd

    from node_html_parser_ray.pipelines.queries import ORACLE_SQL, QUERIES

    result = QUERIES[name](probe_dir)
    if isinstance(result, pd.DataFrame):
        got = result
    elif isinstance(result, pa.Table):
        got = result.to_pandas()
    else:
        got = result.to_pandas()

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders",
              "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{probe_dir}/{t}.parquet')"
        )
    want = con.execute(ORACLE_SQL[name]).df()
    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _value_rows(got) == _value_rows(want), name


class TestEventsHourlyNullTsAndNegativeSum:
    def test_null_ts_group_kept_and_negative_half_rounds_away(
        self, ray_session, tmp_path
    ):
        """A null ts must survive as the '' window group (pandas groupby
        silently drops NaT keys; SQL keeps NULL), and a negative hourly sum
        landing exactly on a half-milli must round AWAY from zero like
        DuckDB ROUND (-2.5 milli -> -3, not floor(-2.5+0.5) = -2)."""
        import pandas as pd

        from node_html_parser_ray.pipelines.queries import ORACLE_SQL, QUERIES

        d = str(tmp_path)
        pq.write_table(pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([_ts(0), None, _ts(0), dt.datetime(2001, 1, 1)],
                           pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["a", "a", "a", "neg"]),
            "value": pa.array([1.0, 2.0, 3.0, -0.0025], pa.float64()),
            "props": ["{}"] * 4,
        }), os.path.join(d, "events.parquet"))

        got = QUERIES["events_hourly"](d)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{d}/events.parquet')"
        )
        want = con.execute(ORACLE_SQL["events_hourly"]).df()
        assert _value_rows(got) == _value_rows(want)
        neg = got[got["event_type"] == "neg"]
        assert neg["sum_value_milli"].tolist() == [-3]
        assert (got["window_start"] == "").sum() == 1


class TestEmbeddingProbe:
    def test_ann_topk_ties_zero_vector_and_small_n(self, ray_session, tmp_path):
        """Cosine ties (duplicate + scaled copies of the query), a zero-norm
        vector (undefined cosine -> ranked last, matching SQL NULLS LAST),
        and n < k all order identically to the DuckDB oracle."""
        import numpy as np
        import pandas as pd

        from node_html_parser_ray.pipelines.queries import ORACLE_SQL, QUERIES

        d = str(tmp_path)
        rng = np.random.RandomState(5)
        dim = 16
        q = rng.standard_normal(dim).astype(np.float32)
        vecs = [q, q.copy(), q * 2.0, np.zeros(dim, np.float32), -q,
                rng.standard_normal(dim).astype(np.float32),
                rng.standard_normal(dim).astype(np.float32)]
        tb = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        })
        pq.write_table(tb, os.path.join(d, "embeddings.parquet"))

        got = QUERIES["ann_topk"](d)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{d}/embeddings.parquet')"
        )
        want = con.execute(ORACLE_SQL["ann_topk"]).df()
        g = got.sort_values("rank")[["rank", "vec_id"]].values.tolist()
        w = want.sort_values("rank")[["rank", "vec_id"]].values.tolist()
        assert g == w
