"""Temporal custom operators (as-of join, range join, exact grouped
quantiles) — planted edge cases the sf corpora can't guarantee to hit:
equal-timestamp ties on both the as-of and the window boundaries, users
with no sources, singleton groups. Cross-checked against DuckDB on the
same crafted table, mirroring the driver gate."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod
from ck_ray.pipelines import relational

US = 1_000_000


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    """events.parquet with deliberate ties:
    - user 1: purchase at t=100s, event (view) ALSO at t=100s (strict <
      means no match), view at 150s (matches the 100s purchase);
    - user 2: two purchases at the SAME ts=50s (gap determinism), view
      at 60s; error at 50s+5min exactly (click at 50s is >= lo: counts);
    - user 3: click at t=200s, error at t=200s (strict hi: click at the
      error's own ts must NOT count), error at 200s+299s (counts);
    - user 4: events but no purchases and no clicks.
    """
    d = tmp_path_factory.mktemp("crafted_sf")
    rows = [
        # (event_id, ts_sec, user_id, event_type, value)
        (1, 100, 1, "purchase", 1.25),
        (2, 100, 1, "view", 2.5),
        (3, 150, 1, "view", 0.5),
        (4, 50, 2, "purchase", 3.0),
        (5, 50, 2, "purchase", 4.0),
        (6, 60, 2, "view", 1.0),
        (7, 50, 2, "click", 0.25),
        (8, 50 + 300, 2, "error", 0.125),
        (9, 200, 3, "click", 9.0),
        (10, 200, 3, "error", 8.0),
        (11, 200 + 299, 3, "error", 7.0),
        (12, 10, 4, "view", 6.0),
        (13, 20, 4, "error", 5.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], np.int64) * US,
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def crafted_con(crafted_dir):
    c = duckdb.connect()
    c.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(crafted_dir, 'events.parquet')}'"
    )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "events_asof_prev_purchase",
        "error_click_window_counts",
        "event_value_quantiles",
    ],
)
def test_crafted_ties_match_oracle(ray_session, crafted_dir, crafted_con, name):
    ours = entrymod.queries()[name](crafted_dir)
    theirs = crafted_con.sql(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(
        _norm(ours), _norm(theirs), check_dtype=False, atol=0, rtol=0
    )


def test_asof_strictness_planted(ray_session, crafted_dir):
    """Hand-computed expectations for the planted ties (guards the SQL
    and the kernel together from agreeing on the wrong semantics)."""
    out = relational.events_asof_prev_purchase(crafted_dir)
    byt = out.set_index("event_type")
    # user-1 view@100 does NOT match purchase@100 (strict); view@150 does
    # (gap 50s). user-2 view@60 matches purchase@50 (gap 10s). user-4
    # view@10 has no source.
    assert int(byt.loc["view", "n_events"]) == 4
    assert int(byt.loc["view", "n_matched"]) == 2
    assert int(byt.loc["view", "sum_gap_us"]) == (50 + 10) * US
    # the purchase@100 (user 1) has no earlier purchase; user-2's two
    # same-ts purchases match nothing (strict <)
    assert int(byt.loc["purchase", "n_matched"]) == 0


def test_range_window_boundaries_planted(ray_session, crafted_dir):
    out = relational.error_click_window_counts(crafted_dir).set_index(
        "user_id"
    )
    # user 2: error@350s, window [50s, 350s): click@50s == lo -> counts
    assert int(out.loc[2, "total_clicks_5m"]) == 1
    # user 3: error@200s excludes click@200s (hi strict); error@499s
    # includes it (499-299=200 >= lo)
    assert int(out.loc[3, "n_errors"]) == 2
    assert int(out.loc[3, "total_clicks_5m"]) == 1
    assert int(out.loc[3, "errors_with_click"]) == 1
    # user 4 has an error but no clicks at all
    assert int(out.loc[4, "total_clicks_5m"]) == 0


def test_late_ship_priority_counts_planted(ray_session, tmp_path):
    """EXISTS semi-join: an order is late iff ANY line item ships after
    the order date; orders with no items never match."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.pipelines.relational import late_ship_priority_counts

    d = tmp_path / "sf"
    d.mkdir()
    day = np.datetime64("2024-01-10", "us")

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1] * 4, pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4),
            "o_totalprice": pa.array([1.0] * 4),
            "o_orderdate": pa.array([day] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                         "2-HIGH", "2-HIGH"]),
        }
    )
    late = day + np.timedelta64(5, "D").astype("timedelta64[us]")
    early = day - np.timedelta64(5, "D").astype("timedelta64[us]")
    items = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 4, 4, 4], pa.int64()),
            "l_partkey": pa.array([1] * 6, pa.int64()),
            "l_suppkey": pa.array([1] * 6, pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 1, 2, 3], pa.int64()),
            "l_quantity": pa.array([1.0] * 6),
            "l_extendedprice": pa.array([1.0] * 6),
            "l_discount": pa.array([0.0] * 6),
            "l_tax": pa.array([0.0] * 6),
            "l_returnflag": pa.array(["N"] * 6),
            "l_linestatus": pa.array(["O"] * 6),
            # order 1: one early + one LATE; order 2: early only (not
            # late); order 3: no items; order 4: early, early, LATE
            "l_shipdate": pa.array(
                [early, late, early, early, early, late],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(items, str(d / "lineitem.parquet"))

    out = late_ship_priority_counts(str(d)).set_index("o_orderpriority")
    assert out.loc["1-URGENT", "late_orders"] == 1  # order 1 only
    assert out.loc["2-HIGH", "late_orders"] == 1    # order 4 only
    assert len(out) == 2


def test_event_funnel_semantics(ray_session, tmp_path):
    """Windowed funnel: chain order, strict timestamps, and the window
    anchored at the chain's FIRST event — planted users covering each
    level."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.pipelines.relational import event_funnel

    H = 3_600_000_000  # 1h in us
    base = 1_700_000_000_000_000
    rows = []  # (user, type, t_us)

    def ev(u, typ, t):
        rows.append((u, typ, base + t))

    # u1: full chain within 6h -> level 3
    ev(1, "view", 0); ev(1, "click", 1 * H); ev(1, "purchase", 2 * H)
    # u2: chain exists but purchase beyond 6h of the view -> level 2
    ev(2, "view", 0); ev(2, "click", 1 * H); ev(2, "purchase", 8 * H)
    # u3: purchase BEFORE click (wrong order) -> level 2
    ev(3, "view", 0); ev(3, "purchase", 1 * H); ev(3, "click", 2 * H)
    # u4: view only -> level 1
    ev(4, "view", 0)
    # u5: click+purchase but never a view -> level 0 (absent)
    ev(5, "click", 0); ev(5, "purchase", 1 * H)
    # u6: first anchor fails the window but a LATER view anchors a
    # fast chain -> level 3 (max over anchors)
    ev(6, "view", 0)
    ev(6, "view", 10 * H); ev(6, "click", 11 * H); ev(6, "purchase", 12 * H)
    # u7: click at the SAME microsecond as view (not strictly after)
    ev(7, "view", 0); ev(7, "click", 0); ev(7, "purchase", 1 * H)

    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                np.array([r[2] for r in rows], "datetime64[us]")
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = event_funnel(str(tmp_path), window_hours=6)
    expect = pd.DataFrame(
        {"stage": [1, 2, 3], "n_users": [6, 4, 2]}
        # stage1: u1,u2,u3,u4,u6,u7 (u5 has no view)
        # stage2: u1,u2,u3,u6 (u7's click not strictly after)
        # stage3: u1,u6
    ).astype("int64")
    pd.testing.assert_frame_equal(got, expect)


def test_event_funnel_no_matching_stages(ray_session, tmp_path):
    """Zero matching events -> every stage counts 0 (not a crash)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.pipelines.relational import event_funnel

    t = pa.table(
        {
            "event_id": pa.array([0], pa.int64()),
            "ts": pa.array(np.array([0], "datetime64[us]")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["error"], pa.string()),
            "value": pa.array([0.0]),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = event_funnel(str(tmp_path))
    assert list(got["stage"]) == [1, 2, 3]
    assert list(got["n_users"]) == [0, 0, 0]


def test_auto_histogram_interval_selection(ray_session, tmp_path):
    """The adaptive rule picks the smallest ladder rung whose grid
    bucket count fits the target — verified across targets on a
    hand-built series, plus exact bucket contents."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.pipelines.relational import events_auto_histogram

    base = pd.Timestamp("2024-01-01 00:00:00")
    ts = [base + pd.Timedelta(minutes=m) for m in (0, 1, 7, 30, 119)]
    t = pa.table(
        {
            "ts": pa.array(ts),
            "value": pa.array([1.5, 2.25, 0.5, 1.0, 3.0]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    # span 119 min: minute grid needs 120 buckets, 30-min grid 4
    out = events_auto_histogram(sf, target_buckets=4)
    assert out["interval_s"].iloc[0] == 1800
    assert out["n"].sum() == 5
    e0 = int(base.timestamp())
    assert out["bucket_epoch"].tolist() == [
        e0, e0 + 1800, e0 + 1800 * 3
    ]
    assert out["n"].tolist() == [3, 1, 1]
    assert out["total_value_e6"].tolist() == [
        4_250_000, 1_000_000, 3_000_000
    ]
    # a looser target picks a finer rung
    fine = events_auto_histogram(sf, target_buckets=200)
    assert fine["interval_s"].iloc[0] == 60
    assert int(fine["n"].sum()) == 5
    # tighter: everything collapses into few wide buckets
    coarse = events_auto_histogram(sf, target_buckets=1)
    assert coarse["interval_s"].iloc[0] >= 7200 or len(coarse) == 1


def test_events_derivative_pipeline_aggs(ray_session, tmp_path):
    """derivative + cumulative_sum over observed hourly buckets, per
    type: hand-built series with gaps and multiple types."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.pipelines.relational import events_derivative

    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = []
    # type a: hours 0,0,1,3 (gap at 2) -> buckets n=[2,1,1]
    for h, k in ((0, 2), (1, 1), (3, 1)):
        rows += [("a", base + pd.Timedelta(hours=h))] * k
    # type b: hours 0,1,1 -> buckets n=[1,2]
    for h, k in ((0, 1), (1, 2)):
        rows += [("b", base + pd.Timedelta(hours=h))] * k
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_derivative(str(tmp_path))
    got = list(map(tuple, out.to_records(index=False)))
    h = lambda i: (base + pd.Timedelta(hours=i)).strftime(
        "%Y-%m-%d %H:00:00"
    )
    assert got == [
        ("a", h(1), 1, -1, 3),   # 2 -> 1, cum 3
        ("a", h(3), 1, 0, 4),    # gap: delta vs previous OBSERVED
        ("b", h(1), 2, 1, 3),    # first 'b' bucket omitted
    ]
