"""salted_collect_set must equal plain collect_set (set-union is
associative; salting changes only the physical distribution) — checked
on the token->documents inverted-index shape, whose hot tokens are the
whale-key case the salt exists for."""

import pyspark.sql.functions as F

from distributed_map_reduce_spark.functions.agg import salted_collect_set
from distributed_map_reduce_spark.functions.text import exploded_tokens
from distributed_map_reduce_spark.sources import load_table


def test_salted_equals_plain_collect_set(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = exploded_tokens(docs)

    plain = {
        r["token"]: sorted(r["doc_ids"])
        for r in toks.groupBy("token")
        .agg(F.collect_set("doc_id").alias("doc_ids"))
        .collect()
    }
    salted = {
        r["token"]: sorted(r["doc_ids"])
        for r in salted_collect_set(toks, "token", "doc_id", n_salt=7).collect()
    }
    assert salted == plain and len(plain) > 0
