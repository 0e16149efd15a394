"""Stop-shingle df-cap (the dedup skew knob, SCALE.md "Text / dedup
ladder"): behavioral contract of ``jaccard_neardup_pairs(max_doc_freq)``.

Runs at sf0.01 — the gate scale with planted duplicates (each text has
10 copies), which is exactly the regime the cap reasons about."""

from distributed_map_reduce_spark.operators.dedup import (
    jaccard_neardup_pairs,
    q24_ngram_jaccard_dedup,
)

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r["ad"], r["bd"]): r["jacc"] for r in df.collect()}


def test_cap_one_yields_no_pairs(spark):
    """A shingle in only one document can never generate a pair."""
    assert _pairs(jaccard_neardup_pairs(spark, SF, max_doc_freq=1)) == {}


def test_loose_cap_equals_uncapped(spark):
    """A cap above every shingle's document frequency is a no-op."""
    uncapped = _pairs(q24_ngram_jaccard_dedup(spark, SF))
    assert uncapped, "gate corpus must contain near-dup pairs"
    capped = _pairs(jaccard_neardup_pairs(spark, SF, max_doc_freq=10**6))
    assert capped == uncapped


def test_cap_drops_boilerplate_pairs_keeps_true_neardups(spark):
    """The skew scenario the cap exists for: 4 docs sharing a dominant
    boilerplate block pair up only via that block (J≈0.67); one genuine
    near-dup pair overlaps via low-frequency shingles (J=0.6). A cap of
    3 (< boilerplate df of 4) kills the boilerplate pairs and keeps the
    true near-dup — exactly the documented trade."""
    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{boiler} unique{i} filler{i}") for i in range(4)]
    rows += [
        (10, "one two three four five six seven eight nine ten"),
        (11, "one two three four five six seven eight nine END"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = _pairs(jaccard_neardup_pairs(spark, "", docs=docs))
    boiler_pairs = {(a, b) for a in range(4) for b in range(4) if a < b}
    assert boiler_pairs <= set(uncapped)
    assert (10, 11) in uncapped

    capped = _pairs(jaccard_neardup_pairs(spark, "", max_doc_freq=3, docs=docs))
    assert not boiler_pairs & set(capped)
    assert (10, 11) in capped


def test_fuzzy_blocked_equals_nested_loop_variant(spark):
    """Prefix-filter blocking must find exactly the pairs the open
    nested-loop q57 finds — at a cap well beyond the demo range, so the
    equivalence isn't an artifact of the oracle's tiny window."""
    from distributed_map_reduce_spark.operators.dedup import (
        fuzzy_pairs_blocked,
        q57_fuzzy_name_pairs,
    )
    import distributed_map_reduce_spark.operators.dedup as dd

    def rows(df):
        return {(r["ak"], r["bk"]): r["dist"] for r in df.collect()}

    blocked = rows(fuzzy_pairs_blocked(spark, SF, key_cap=400))
    # widen the nested-loop demo cap for the comparison only
    part_cap = dd.LEV_KEY_CAP
    try:
        dd.LEV_KEY_CAP = 400
        reference = rows(q57_fuzzy_name_pairs(spark, SF))
    finally:
        dd.LEV_KEY_CAP = part_cap
    assert blocked == reference
    assert blocked, "cap-400 range must contain fuzzy pairs"


def test_fuzzy_blocked_short_strings_use_length_bands(spark):
    """The part corpus never has names below the q*(k+1) count-filter
    threshold, so pin the short-string path synthetically: short names
    sharing NO q-gram must still pair when within edit distance k
    (length-band blocking), and the result must equal brute force."""
    from distributed_map_reduce_spark.operators.dedup import (
        LEV_MAX,
        fuzzy_blocked_pairs_frame,
    )

    names = ["ab", "xy", "abcd", "abcf", "x", "", "gainsboro peru red sandy",
             "gainsboro peru red sandz"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "p_partkey long, p_name string"
    )
    got = {
        (r["ak"], r["bk"]): r["dist"]
        for r in fuzzy_blocked_pairs_frame(df).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (i, j): lev(names[i], names[j])
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= LEV_MAX
    }
    assert got == want
    # the interesting case really is in there: zero shared grams, ed<=k
    assert (0, 1) in want  # "ab" vs "xy"
