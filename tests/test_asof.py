"""asof_join edge-case contract: inclusive at-or-before boundary,
largest-tiebreak-wins on equal right timestamps, NULL payload when no
prior right row exists, and key isolation — plus a hypothesis
differential against a brute-force Python oracle."""

from datetime import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_map_reduce_spark.operators.asof import asof_join


def _t(s):
    return datetime.fromisoformat(s)


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _t("2024-01-01T10:00:00")),  # before any right row
            (2, 100, _t("2024-01-01T12:00:00")),  # exactly at a right ts
            (3, 100, _t("2024-01-01T13:00:00")),  # after the tie pair
            (4, 200, _t("2024-01-01T23:00:00")),  # other key: isolated
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 100, _t("2024-01-01T12:00:00")),  # tie pair ...
            (11, 100, _t("2024-01-01T12:00:00")),  # ... larger id wins
            (12, 200, _t("2024-01-01T11:00:00")),
            (13, 300, _t("2024-01-01T00:00:00")),  # never matches
        ],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["id"]: r["m"]
        for r in asof_join(
            left, right,
            by="k", left_ts="ts", right_ts="ts",
            right_payload={"rid": "m"}, tiebreak="rid",
        ).collect()
    }
    assert out == {1: None, 2: 11, 3: 11, 4: 12}


# integer timestamps: asof_join only needs an ordered type, and small
# ints maximize tie/boundary collisions — the cases that matter
_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10)), min_size=1, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_rows, _rows)
def test_asof_matches_bruteforce_oracle(spark, lrows, rrows):
    llist = [(i, k, t) for i, (k, t) in enumerate(lrows)]
    rlist = [(100 + i, k, t) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(llist, "id long, k long, ts long")
    right = spark.createDataFrame(rlist, "rid long, k long, ts long")
    got = {
        r["id"]: r["m"]
        for r in asof_join(
            left, right,
            by="k", left_ts="ts", right_ts="ts",
            right_payload={"rid": "m"}, tiebreak="rid",
        ).collect()
    }
    want = {}
    for lid, k, t in llist:
        cands = [(rt, rid) for rid, rk, rt in rlist if rk == k and rt <= t]
        want[lid] = max(cands)[1] if cands else None
    assert got == want


def test_asof_join_null_keys_never_match(spark):
    # SQL equi-join semantics: NULL never matches NULL. A NULL-key right
    # row must not leak its payload into NULL-key left rows (Window
    # .partitionBy would group them together without the guard); NULL-key
    # left rows still surface, with NULL payload.
    left = spark.createDataFrame(
        [(1, None, _t("2024-01-01T12:00:00")),
         (2, 100, _t("2024-01-01T12:00:00"))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, None, _t("2024-01-01T11:00:00")),
         (11, 100, _t("2024-01-01T11:00:00"))],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["id"]: r["m"]
        for r in asof_join(
            left, right,
            by="k", left_ts="ts", right_ts="ts",
            right_payload={"rid": "m"}, tiebreak="rid",
        ).collect()
    }
    assert out == {1: None, 2: 11}


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _t("2024-01-01T10:00:00")),  # next right at 12:00
            (2, 100, _t("2024-01-01T12:00:00")),  # exactly at right ts
            (3, 100, _t("2024-01-01T13:00:00")),  # nothing after
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 100, _t("2024-01-01T12:00:00")),
            (11, 100, _t("2024-01-01T12:00:00")),  # tie: larger id wins
        ],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["id"]: r["m"]
        for r in asof_join(
            left, right,
            by="k", left_ts="ts", right_ts="ts",
            right_payload={"rid": "m"}, tiebreak="rid",
            direction="forward",
        ).collect()
    }
    assert out == {1: 11, 2: 11, 3: None}


def test_asof_tolerance_bounds_match(spark):
    left = spark.createDataFrame(
        [(1, 100, _t("2024-01-01T12:00:00"))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 100, _t("2024-01-01T10:00:00"))], "rid long, k long, ts timestamp"
    )
    kw = dict(
        by="k", left_ts="ts", right_ts="ts",
        right_payload={"rid": "m"}, tiebreak="rid",
    )
    # 2h gap: within a 2-hour tolerance (inclusive), outside 1 hour
    hit = asof_join(left, right, tolerance="2 HOURS", **kw).collect()[0]["m"]
    miss = asof_join(left, right, tolerance="1 HOUR", **kw).collect()[0]["m"]
    assert hit == 10
    assert miss is None


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_rows, _rows)
def test_asof_forward_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)],
        "id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(rrows)],
        "rid long, k long, ts long",
    )
    got = {
        r["id"]: r["m"]
        for r in asof_join(
            left, right,
            by="k", left_ts="ts", right_ts="ts",
            right_payload={"rid": "m"}, tiebreak="rid",
            direction="forward",
        ).collect()
    }
    for i, (k, ts) in enumerate(lrows):
        cands = [
            (rts, rid)
            for rid, (rk, rts) in enumerate(rrows)
            if rk == k and rts >= ts
        ]
        want = max(
            (c for c in cands if c[0] == min(x[0] for x in cands)),
            default=None,
        )
        assert got[i] == (want[1] if want else None), (i, k, ts, cands)
