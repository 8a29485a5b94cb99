"""Point-in-time SCD2 temporal join (round 12): regime coverage
(before-first / v1 / v2-open / closed-by-delete) and the null-carry
regression — an OPEN valid_to (NULL) must overwrite the previous
version's CLOSED one through the as-of carry."""

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.cdc import scd2_from_log, temporal_join


def _hist(spark):
    # key 1: I@1, U@3 (open)      -> v1 [1,3), v2 [3,∞)
    # key 2: I@1, D@4             -> v1 [1,4), nothing after
    # key 3: I@2 (open only)      -> v1 [2,∞)
    feed = spark.createDataFrame(
        [
            (1, "a1", 1, "I"), (1, "a2", 3, "U"),
            (2, "b1", 1, "I"), (2, None, 4, "D"),
            (3, "c1", 2, "I"),
        ],
        "k int, seg string, seq int, op string",
    )
    return scd2_from_log(feed, keys=["k"], sequence_col="seq", op_col="op").filter(
        F.col("op") != "D"
    )


def test_temporal_join_regimes(spark):
    hist = _hist(spark)
    facts = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(
            [(1, 0), (1, 1), (1, 3), (1, 9),   # before / v1 / v2 edge / v2 open
             (2, 3), (2, 4), (2, 9),           # v1 / deleted edge / deleted
             (3, 1), (3, 2),                   # before / v1
             (9, 5)]                            # key with no history at all
        )],
        "fid int, k int, ts int",
    )
    out = temporal_join(
        facts, hist.select("k", "seg", "valid_from", "valid_to"),
        keys=["k"], ts_col="ts", value_cols=["seg"],
    )
    got = {(r["k"], r["ts"]): (r["seg"], r["dim_matched"]) for r in out.collect()}
    assert got[(1, 0)] == (None, False)
    assert got[(1, 1)] == ("a1", True)
    # the null-carry regression: v2 is OPEN (valid_to NULL) and must
    # supersede v1's closed interval at its own start
    assert got[(1, 3)] == ("a2", True)
    assert got[(1, 9)] == ("a2", True)
    assert got[(2, 3)] == ("b1", True)
    assert got[(2, 4)] == (None, False)  # delete closes at 4, half-open
    assert got[(2, 9)] == (None, False)
    assert got[(3, 1)] == (None, False)
    assert got[(3, 2)] == ("c1", True)
    assert got[(9, 5)] == (None, False)
    assert out.count() == facts.count()  # left-outer: every fact kept
