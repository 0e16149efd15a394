"""Property-based contracts of the docrange streaming reader
(sources/pystreamsource.py), over hypothesis-generated inputs.

The round-12 example tests pin specific splits and one restart
interleaving; these generalize the three pure-Python contracts the
recovery story rests on to ARBITRARY inputs — no SparkSession needed,
so hypothesis can afford real example counts:

- range reads compose: any chain of cut points reads the same rows as
  the single range (what makes WAL-ranged re-reads deterministic);
- partitions() tiles exactly: contiguous, in-bounds, covering
  [max(start, committed), end) for any geometry and any committed mark
  (the exactly-once clip, generalized);
- the WAL-cursor parser returns the newest planned/committed offsets
  from a synthetic checkpoint and never raises on junk, empty, or
  truncated log files (the failure-path hardening, generalized).
"""

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_map_reduce_spark.sources.pystreamsource import (
    _DocRangeStreamReader,
    _read_row_range,
    _recover_wal_cursor,
)


def _docs_path(sf_dir):
    return f"{sf_dir.rstrip('/')}/documents.parquet"


def _rows(batch_iter):
    """Flatten _read_row_range's pyarrow.RecordBatch yields to row
    dicts: the recovery invariant is about the ROW stream — batch
    boundaries legitimately differ between a whole read and a chain of
    sub-reads."""
    import pyarrow as pa

    batches = list(batch_iter)
    return pa.Table.from_batches(batches).to_pylist() if batches else []


@settings(max_examples=20, deadline=None)
@given(
    cuts=st.lists(st.integers(min_value=0, max_value=80), max_size=6),
    lo=st.integers(min_value=0, max_value=40),
    span=st.integers(min_value=0, max_value=60),
)
def test_read_row_range_composes(sf_dir, cuts, lo, span):
    """Reading [lo, hi) in one call equals reading it as the chain of
    segments induced by any cut points — the determinism Spark's
    failure recovery relies on when it re-reads committed offset
    ranges in different batchings."""
    path = _docs_path(sf_dir)
    hi = lo + span
    points = sorted({lo, hi, *[c for c in cuts if lo <= c <= hi]})
    whole = _rows(_read_row_range(path, lo, hi))
    chained = [
        row
        for a, b in zip(points, points[1:])
        for row in _rows(_read_row_range(path, a, b))
    ]
    assert chained == whole
    assert len(whole) == span


@settings(max_examples=60, deadline=None)
@given(
    b=st.integers(min_value=0, max_value=1000),
    span=st.integers(min_value=0, max_value=500),
    chunk=st.integers(min_value=1, max_value=97),
    committed=st.integers(min_value=0, max_value=1500),
)
def test_partitions_tile_with_committed_clip(b, span, chunk, committed):
    """partitions(start, end) must tile exactly [max(start, committed),
    end): contiguous, non-empty, in-bounds — for ANY range geometry,
    chunk size, and committed mark. Zero coverage (fully-clipped or
    empty range) must yield zero partitions, not degenerate ones."""
    e = b + span
    r = _DocRangeStreamReader({"path": "unused.parquet", "partitionRows": str(chunk)})
    r._committed = committed
    spans = [(p.begin, p.end) for p in r.partitions({"row": b}, {"row": e})]
    lo0 = max(b, committed)
    if lo0 >= e:
        assert spans == []
    else:
        assert spans[0][0] == lo0 and spans[-1][1] == e
        assert all(x < y for x, y in spans)
        assert all(y0 == x1 for (_, y0), (x1, _) in zip(spans, spans[1:]))
        assert all(y - x <= chunk for x, y in spans)
    # planning never moves the planned mark backwards
    assert r._planned >= min(b, e)


_wal_rows = st.lists(
    st.integers(min_value=1, max_value=10_000), min_size=1, max_size=8
).map(lambda xs: sorted(set(xs)))


@settings(max_examples=40, deadline=None)
@given(
    rows=_wal_rows,
    n_committed=st.integers(min_value=0, max_value=8),
    junk=st.sampled_from(["none", "empty", "truncated", "nonnumeric", "tmp"]),
)
def test_recover_wal_cursor_synthetic(tmp_path_factory, rows, n_committed, junk):
    """The cursor parser returns (newest offsets entry, offsets entry of
    the newest committed batch) from a synthetic checkpoint and
    tolerates the junk a crash can leave behind: empty finalized files,
    truncated json, stray non-numeric names, .tmp leftovers."""
    ckpt = tmp_path_factory.mktemp("wal")
    os.makedirs(ckpt / "offsets", exist_ok=True)
    os.makedirs(ckpt / "commits", exist_ok=True)
    for i, row in enumerate(rows):
        (ckpt / "offsets" / str(i)).write_text(
            "v1\n" + json.dumps({"batchWatermarkMs": 0}) + "\n"
            + json.dumps({"row": row}) + "\n"
        )
    k = min(n_committed, len(rows))
    for i in range(k):
        (ckpt / "commits" / str(i)).write_text(
            "v1\n" + json.dumps({"nextBatchWatermarkMs": 0}) + "\n"
        )
    if junk == "empty":
        (ckpt / "offsets" / str(len(rows))).write_text("")
    elif junk == "truncated":
        (ckpt / "offsets" / str(len(rows))).write_text('v1\n{"row": 12')
    elif junk == "nonnumeric":
        (ckpt / "offsets" / ".DS_Store").write_text("junk")
        (ckpt / "commits" / "metadata").write_text("junk")
    elif junk == "tmp":
        (ckpt / "offsets" / "99.tmp").write_text('{"row": 999999}')

    planned, committed = _recover_wal_cursor(str(ckpt))
    # junk "empty"/"truncated" add a NEWER offsets batch whose row is
    # unreadable — the cursor falls back to the newest READABLE entry
    # (degrading to 0 would resurrect the stall corner the cursor
    # exists to close)
    assert planned == rows[-1]
    assert committed == (rows[k - 1] if k else 0)
