"""Round-8 operator tests: planted-structure checks for the two
deferred-ledger resolutions (oracle parity runs in the differential
board; here we verify the MATH finds what we planted)."""

from __future__ import annotations

import datetime as dt
import json

from big_data_instacart_market_basket_analysis_spark.operators import (
    temporal,
)


def _events(spark, rows):
    """rows: (user_id, ts, event_type, item)."""
    return spark.createDataFrame(
        [
            (i, ts, uid, et, 1.0, json.dumps({"k": item}))
            for i, (uid, ts, et, item) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_periodogram_finds_planted_weekly_cycle(spark):
    """28-day purchase series with a clean 7-day spike pattern (and one
    zero-purchase day that only the calendar gap-fill can represent):
    the period-7 bin must be the unique peak."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(28):
        if d == 5:
            continue  # planted gap day: 0 purchases
        n = 15 if d % 7 == 0 else 10
        for i in range(n):
            rows.append((1, base + dt.timedelta(days=d, minutes=i),
                         "purchase", 1))
    df = temporal.periodogram_daily(_events(spark, rows))
    got = {r["period"]: (r["power"], r["is_peak"]) for r in df.collect()}
    assert set(got) == set(range(2, 15))
    peaks = [p for p, (_, ispk) in got.items() if ispk]
    assert peaks == [7]
    # the planted gap day adds broadband power; the 7-day line must
    # still dominate every other bin by a wide margin
    assert got[7][0] > 1.5 * max(
        pw for p, (pw, _) in got.items() if p != 7
    )


def test_lru_hitrate_hand_worked_trace(spark):
    """Single user accessing [1,2,1,3,1,2]: hits are 0 (k=1), 2 (k=2),
    3 (k=4 and k=8) — worked by hand against the LRU definition."""
    base = dt.datetime(2024, 1, 1)
    trace = [1, 2, 1, 3, 1, 2]
    rows = [
        (7, base + dt.timedelta(minutes=i), "view", item)
        for i, item in enumerate(trace)
    ]
    df = temporal.lru_hitrate(_events(spark, rows))
    got = {r["capacity"]: (r["n_refs"], r["hits"], r["hit_rate"])
           for r in df.collect()}
    assert got == {
        1: (6, 0, 0.0),
        2: (6, 2, round(2 / 6, 6)),
        4: (6, 3, 0.5),
        8: (6, 3, 0.5),
    }


def test_lru_hitrate_monotone_in_capacity(spark):
    """On any trace, hits are monotone non-decreasing in capacity
    (LRU's inclusion property)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        for i in range(40):
            rows.append(
                (u, base + dt.timedelta(minutes=i), "view",
                 (i * (u + 3)) % 7)
            )
    got = {
        r["capacity"]: r["hits"]
        for r in temporal.lru_hitrate(_events(spark, rows)).collect()
    }
    assert got[1] <= got[2] <= got[4] <= got[8]
    assert got[8] > 0
