"""Temporal/interval joins: as-of (point-in-time) and range (band) join.

``asof_join`` matches each left row to the single most recent right row
at or before it per key: click->purchase attribution, price-at-trade
lookup, sensor-state-at-event. The reference has no joins at all
(SURVEY §2.3); this is the canonical "custom operator" gap-fill, built
as a *composition of existing DataFrame ops* (the preferred tier — no
Pandas UDF needed):

    union(left, right) -> window last(right_payload, ignorenulls=True)
      over (partition by key order by ts, side, tiebreak)

One shuffle on the key, one per-partition sort — the same cost as a
regular sort-merge join, versus the naive inequality-join
(range-join explosion) or a per-key ``applyInPandas`` (Python in the
hot path). Ordering puts right rows *before* left rows at equal ts, so
"at or before" is inclusive; ties among right rows resolve to the
largest tiebreak value, pinning determinism for the oracle.

Scale notes: at 100 TB the window state per key is one row (the running
last right payload) — constant memory, spill-free; skewed keys split
fine under AQE because ROWS-frame ``last`` is computed in one pass per
partition after the sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import QuerySpec
from ..sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_payload: dict[str, str],
    tiebreak: str,
    direction: str = "backward",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """For each left row: columns of the nearest right row at or before
    (``direction='backward'``) / at or after (``'forward'``) its
    timestamp with an equal ``by`` key — NULLs when none exists.

    ``right_payload`` maps right column -> output alias; ``tiebreak``
    is a right column ordering equal-timestamp right rows (the largest
    wins), required so results are deterministic. ``tolerance`` bounds
    the match: a right row farther than the tolerance nulls out,
    inclusive at the bound — pandas ``merge_asof`` semantics. On a
    timestamp axis it is an INTERVAL literal body (e.g. ``'1 hour'``);
    on a numeric axis it must be a number (or a numeric string —
    anything else raises, rather than silently NULLing every match via
    implicit string->numeric coercion, which also breaks under ANSI
    mode).

    Forward direction reuses the backward machinery on a negated time
    axis (order by ``-unix_micros(ts)``): "latest at-or-before" in
    negated time IS "earliest at-or-after" in real time, so both
    directions share one plan shape — a union, one shuffle on the key,
    one per-partition sort.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = dict(right_payload)
    payload_cols["__rts"] = "__rts"  # carry the matched row's timestamp
    payload: Column = F.struct(
        *[
            (F.col(right_ts) if c == "__rts" else F.col(c)).alias(a)
            for c, a in payload_cols.items()
        ]
    )
    # SQL equi-join semantics: NULL keys never match. Window.partitionBy
    # groups NULLs together, so an unfiltered NULL-key right row would
    # leak its payload into NULL-key left rows — drop them up front.
    # (Left NULL-key rows stay: they emit NULL payload, as a left join
    # would.)
    def _ord(df: DataFrame, ts_col: str) -> Column:
        ts = F.col(ts_col)
        if direction == "backward":
            return ts  # any ordered type, unchanged axis
        # forward: negate the axis (numerics directly, timestamps via
        # their microsecond count)
        if df.schema[ts_col].dataType.simpleString().startswith("timestamp"):
            return -F.unix_micros(ts.cast("timestamp"))
        return -ts

    r0 = right.filter(F.col(by).isNotNull()).select(
        F.col(by).alias("__by"),
        _ord(right, right_ts).alias("__ord"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        payload.alias("__p"),
    )
    l = left.select(
        F.col(by).alias("__by"),
        _ord(left, left_ts).alias("__ord"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r0.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r0.schema["__p"].dataType).alias("__p"),
        F.struct(*left.columns).alias("__l"),
    )
    r = r0.withColumn(
        "__l", F.lit(None).cast(l.schema["__l"].dataType)
    )
    w = (
        Window.partitionBy("__by")
        .orderBy("__ord", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        is_ts = (
            left.schema[left_ts].dataType.simpleString().startswith("timestamp")
        )
        lts = F.col(f"__l.{left_ts}")
        rts = F.col("__m.__rts")
        if is_ts:
            # A bare number here would render "INTERVAL 3600" — a
            # unit-less interval literal that fails to parse. Demand the
            # INTERVAL body string up front with a readable error.
            if not isinstance(tolerance, str):
                raise TypeError(
                    "timestamp as-of axis needs an INTERVAL literal body "
                    f"string (e.g. '1 hour'), got {type(tolerance).__name__}"
                )
            delta = F.expr(f"INTERVAL {tolerance}")
            lts, rts = lts.cast("timestamp"), rts.cast("timestamp")
        else:
            # Numeric axis: validate up front. A non-numeric string
            # would implicitly coerce to NULL (nulling every match
            # silently) or raise mid-job under ANSI mode.
            if isinstance(tolerance, str):
                try:
                    tolerance = float(tolerance)
                except ValueError:
                    raise ValueError(
                        "numeric as-of axis needs a numeric tolerance, "
                        f"got {tolerance!r}"
                    ) from None
            elif not isinstance(tolerance, (int, float)):
                raise TypeError(
                    "tolerance must be str|int|float, "
                    f"got {type(tolerance).__name__}"
                )
            delta = F.lit(tolerance)
        in_tol = (
            rts >= lts - delta
            if direction == "backward"
            else rts <= lts + delta
        )
        # inclusive at the bound (pandas merge_asof semantics)
        matched = matched.withColumn("__m", F.when(in_tol, F.col("__m")))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{a}").alias(a) for a in right_payload.values()]
    return matched.select(*out_cols)


def q33_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event attributed to the user's most recent click at
    or before it (classic last-touch attribution) — the as-of join over
    the events table against itself."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return (
        asof_join(
            purchases,
            clicks,
            by="user_id",
            left_ts="ts",
            right_ts="ts",
            right_payload={"event_id": "click_id", "ts": "click_ts"},
            tiebreak="event_id",
        )
        .orderBy("event_id")
    )


Q33_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT c.event_id AS click_id, c.ts AS click_ts
  FROM events c
  WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC
  LIMIT 1
) c ON TRUE
ORDER BY p.event_id
"""

def q128_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the user's NEXT purchase at or after it
    — the FORWARD as-of direction (conversion linking), driver-checked
    where q33 covers backward. Forward reuses the backward machinery on
    a negated axis (asof.py:62), so this query pins that the negation
    trick survives the oracle: earliest at-or-after purchase, ties to
    the highest event_id (pandas merge_asof forward semantics)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return (
        asof_join(
            clicks,
            purchases,
            by="user_id",
            left_ts="ts",
            right_ts="ts",
            right_payload={"event_id": "purchase_id", "ts": "purchase_ts"},
            tiebreak="event_id",
            direction="forward",
        )
        .orderBy("event_id")
    )


Q128_ORACLE = """
SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN LATERAL (
  SELECT p.event_id AS purchase_id, p.ts AS purchase_ts
  FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
    AND p.ts >= c.ts
  ORDER BY p.ts ASC, p.event_id DESC
  LIMIT 1
) p ON TRUE
ORDER BY c.event_id
"""

# --- range (band) join ------------------------------------------------------

# (band, lo inclusive, hi exclusive) — a literal dimension, deterministic.
VALUE_BANDS = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 50.0),
    ("high", 50.0, 100.0),
    ("vip", 100.0, 1e9),
]


def q34_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events bucketed into value bands via an interval
    predicate against a broadcast dimension.

    The right plan for interval joins against a small band table IS a
    broadcast nested-loop (each row tests |bands| intervals, no shuffle
    of the fact side at all); for large band tables the technique
    switches to equi-prebucketing (floor(value/width) key + residual
    filter) — documented here, unnecessary for 4 bands.
    """
    ev = load_table(spark, sf_dir, "events").select("value")
    # literal LocalRelation (explode of a literal struct array), not
    # createDataFrame: no Python->RDD round trip, stays JVM-side
    bands = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.lit(lo).alias("lo"),
                        F.lit(hi).alias("hi"),
                    )
                    for b, lo, hi in VALUE_BANDS
                ]
            )
        ).alias("b")
    ).select("b.*")
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("band")
    )


_BANDS_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in VALUE_BANDS)

Q34_ORACLE = f"""
SELECT band, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM events e
JOIN (VALUES {_BANDS_VALUES}) AS b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY band
ORDER BY band
"""

def q73_next_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each purchase matched to the
    user's NEXT click at or within one hour after it (post-purchase
    engagement) — the direction+tolerance surface of pandas merge_asof,
    same single-shuffle plan as q33's backward join."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return (
        asof_join(
            purchases,
            clicks,
            by="user_id",
            left_ts="ts",
            right_ts="ts",
            right_payload={"event_id": "click_id", "ts": "click_ts"},
            tiebreak="event_id",
            direction="forward",
            tolerance="1 HOUR",
        )
        .orderBy("event_id")
    )


Q73_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT c.event_id AS click_id, c.ts AS click_ts
  FROM events c
  WHERE c.event_type = 'click' AND c.user_id = p.user_id
    AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
  ORDER BY c.ts ASC, c.event_id DESC
  LIMIT 1
) c ON TRUE
ORDER BY p.event_id
"""


MULTITOUCH_WINDOW = "1 hour"


def q105_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: every click by the
    same user in the hour before a purchase shares the purchase value
    equally — the other canonical attribution model next to q33's
    last-touch. Credit is allocated in integer cents with an explicit
    remainder (cents_each = total DIV n, cents_rem = total MOD n): the
    penny-allocation arithmetic real billing systems use, and exact
    integer math, so the hash check has no float rounding surface.

    Scale shape: one hash join on user_id with the time band as a
    post-join predicate (clicks and purchases co-shuffle on the user
    key — no interval explosion), then a count aggregate keyed by
    purchase. Purchases with no in-window click don't appear (q33
    covers the no-touch semantics)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    touched = purchases.join(clicks, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {MULTITOUCH_WINDOW}"))
    )
    return (
        touched.groupBy("event_id", "user_id", "p_ts", "cents")
        .agg(F.count(F.lit(1)).alias("n_touches"))
        .select(
            "event_id",
            "user_id",
            F.col("p_ts").cast("timestamp_ntz").alias("p_ts"),
            "n_touches",
            (F.col("cents") - F.col("cents") % F.col("n_touches"))
            .cast("bigint")
            .alias("_alloc"),
            (F.col("cents") % F.col("n_touches")).cast("bigint").alias(
                "cents_rem"
            ),
        )
        .withColumn(
            "cents_each", (F.col("_alloc") / F.col("n_touches")).cast("bigint")
        )
        .select(
            "event_id", "user_id", "p_ts", "n_touches", "cents_each",
            "cents_rem",
        )
        .orderBy("event_id")
    )


Q105_ORACLE = """
SELECT p.event_id, p.user_id, p.ts AS p_ts,
       COUNT(*) AS n_touches,
       CAST(p.cents // COUNT(*) AS BIGINT) AS cents_each,
       CAST(p.cents % COUNT(*) AS BIGINT) AS cents_rem
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.c_ts <= p.ts AND c.c_ts >= p.ts - INTERVAL 1 HOUR
GROUP BY p.event_id, p.user_id, p.ts, p.cents
ORDER BY p.event_id
"""


QUERIES = [
    QuerySpec("q33_click_attribution", q33_click_attribution, Q33_ORACLE,
              "as-of join: purchases attributed to most recent prior click",
              ("events", "asof", "join")),
    QuerySpec("q128_next_purchase", q128_next_purchase, Q128_ORACLE,
              "forward as-of: each click linked to the user's next "
              "purchase (conversion attribution)",
              ("events", "asof", "join")),
    QuerySpec("q73_next_click_window", q73_next_click_window, Q73_ORACLE,
              "forward as-of join with 1h tolerance (next click after buy)",
              ("events", "asof", "join")),
    QuerySpec("q34_value_band_join", q34_value_band_join, Q34_ORACLE,
              "range join: events into value bands via broadcast interval join",
              ("events", "range-join", "join")),
    QuerySpec("q105_multitouch_attribution", q105_multitouch_attribution,
              Q105_ORACLE,
              "linear multi-touch attribution: equal integer-cent credit "
              "to every click in the hour before a purchase",
              ("events", "attribution", "join")),
]
