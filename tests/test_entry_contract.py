"""Shape of the driver contract (__spark_entry__.py) — the module the
per-round verifier imports. A registry entry that breaks these rules
fails here instead of in the driver's CORRECTNESS gate."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns  # stable, named schema


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 36
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL text; every query is callable
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    # rows-only queries are the documented approximate/binary set
    rows_only = set(qs) - set(oracles)
    assert all(
        n.startswith(("ann_", "sketch_", "multimodal_", "pagerank_"))
        for n in rows_only
    ), rows_only


def test_every_query_output_is_scalar_only(spark, sf_dir):
    """Driver-canonicalizer compatibility gate (VERDICT r6 item 4): the
    driver sorts result cells with pandas (Categorical/factorize), which
    throws `unhashable type: 'list'` on array/map cells — exactly how
    q116 went red in round 6 despite correct values. No registered
    query may ship a complex-typed output column; arrays must be
    serialized (concat_ws / to_json / fixed-point strings) before the
    result surface."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from distributed_map_reduce_spark.registry import all_queries

    offenders = []
    for name, spec in all_queries().items():
        schema = spec.build(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders
