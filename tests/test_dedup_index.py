"""Persistent near-dup admission index (round 9 — VERDICT r8 #3):
build → probe → append → probe must equal from-scratch admission each
night, the probe plan must keep the index side motionless, and the
decisions pin must protect against post-append re-evaluation."""

import re
import shutil
import tempfile
import uuid
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.engine import LakeEngine
from cbts_datalake_synnex_spark.operators import dedup
from cbts_datalake_synnex_spark.plans.inspect import explain_str


# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


@contextmanager
def _eng(spark):
    root = tempfile.mkdtemp(prefix="ndidx_")
    db = f"ndidx_{uuid.uuid4().hex[:8]}"
    eng = LakeEngine(spark, root, database=db)
    try:
        yield eng
    finally:
        try:
            spark.catalog.setCurrentDatabase("default")
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        finally:
            shutil.rmtree(root, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


_CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "completely different content about distributed query engines"),
    (6, "a third corpus document with its own unique words entirely"),
]
_B1 = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 0
    (4, "fresh batch one text that matches nothing in the corpus"),
    (7, "another admissible novel document from the first night"),
]
_B2 = [
    (2, "fresh batch one text that matches nothing in the corpus"),  # dup of 4 (b1)
    (5, "a third corpus document with its own unique words entirely"),  # dup of 6
    (8, "genuinely new second-night content admitted freely"),
]


def test_index_admission_equals_from_scratch_across_two_nights(spark):
    corpus = _docs(spark, _CORPUS)
    b1, b2 = _docs(spark, _B1), _docs(spark, _B2)
    with _eng(spark) as eng:
        eng.build_dedup_index("nd", corpus, "doc_id", "text", n_buckets=4)
        d1 = eng.admit_against_dedup_index("nd", b1, "doc_id", "text").localCheckpoint()
        eng.update_dedup_index("nd", b1, d1, "doc_id", "text")
        d2 = eng.admit_against_dedup_index("nd", b2, "doc_id", "text")

        ref1 = dedup.admission_against_corpus(corpus, b1, "doc_id", "text")
        assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, ref1.collect()))
        admitted1 = b1.join(
            d1.filter(F.col("admitted")).select("doc_id"), "doc_id"
        )
        ref2 = dedup.admission_against_corpus(
            corpus.unionByName(admitted1), b2, "doc_id", "text"
        )
        got2 = sorted(map(tuple, d2.collect()))
        assert got2 == sorted(map(tuple, ref2.collect()))
        # night 2 sees night-1 admissions: doc 2 blocked by doc 4 (batch 1)
        by_id = {r[0]: r for r in got2}
        assert by_id[2][1] is False and by_id[2][2] == 4
        assert by_id[5][1] is False and by_id[5][2] == 6
        assert by_id[8][1] is True


def test_update_pins_decisions_against_post_append_reeval(spark):
    """A lazy decisions frame passed to update_dedup_index must keep
    its pre-append values — without the pin every batch doc would
    self-match after the append."""
    corpus = _docs(spark, _CORPUS)
    b1 = _docs(spark, _B1)
    with _eng(spark) as eng:
        eng.build_dedup_index("nd", corpus, "doc_id", "text", n_buckets=4)
        d1 = eng.admit_against_dedup_index("nd", b1, "doc_id", "text")  # lazy
        eng.update_dedup_index("nd", b1, d1, "doc_id", "text")
        # the index now contains exactly corpus + the 2 admitted docs
        n_docs = spark.table(eng.qualified("nd_docs")).count()
        assert n_docs == len(_CORPUS) + 2


def test_probe_plan_keeps_index_side_motionless(spark):
    """With broadcast disabled, the candidate join must read the
    entries table as a bucketed scan with the only exchange on the
    probe side; with defaults, the tiny probe broadcasts instead —
    either way the index never shuffles."""
    corpus = _docs(spark, _CORPUS)
    b1 = _docs(spark, _B1)
    with _eng(spark) as eng:
        eng.build_dedup_index("nd", corpus, "doc_id", "text", n_buckets=4)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            d = eng.admit_against_dedup_index("nd", b1, "doc_id", "text")
            plan = explain_str(d, "simple")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # both index tables read as bucketed scans
        assert plan.count("SelectedBucketsCount") == 2, plan
        assert "nd_entries" in plan and "nd_df" in plan
        # exactly TWO sh-exchanges, both probe-side (candidate join +
        # df attach); the bucketed entries/df sides plan with Sort or
        # HashAggregate directly over the FileScan — were they
        # shuffled too, this count would be 4
        assert len(re.findall(r"Exchange hashpartitioning\(sh", plan)) == 2, plan


def test_df_increments_are_additive(spark):
    corpus = _docs(spark, _CORPUS)
    b1 = _docs(spark, _B1)
    with _eng(spark) as eng:
        eng.build_dedup_index("nd", corpus, "doc_id", "text", n_buckets=4)
        d1 = eng.admit_against_dedup_index("nd", b1, "doc_id", "text").localCheckpoint()
        eng.update_dedup_index("nd", b1, d1, "doc_id", "text")
        # summed df equals a fresh build over corpus + admitted docs
        admitted1 = b1.join(d1.filter(F.col("admitted")).select("doc_id"), "doc_id")
        _, _, fresh = dedup.shingle_index_frames(
            corpus.unionByName(admitted1), "doc_id", "text"
        )
        stored = (
            spark.table(eng.qualified("nd_df"))
            .groupBy("sh")
            .agg(F.sum("df").alias("df"))
        )
        assert sorted(map(tuple, stored.collect())) == sorted(
            map(tuple, fresh.collect())
        )


def test_rejected_batch_shingles_never_enter_the_index(spark):
    """Round 10 (VERDICT r9 #7) — the adversarial golden the
    append-equals-rebuild oracle cannot see: a REJECTED doc's shingles
    must NOT enter the index. Geometry: doc 1 is rejected against
    corpus doc 0 (J=8/14=0.571 >= 0.5) but carries a novel tail; doc 2
    overlaps mostly that tail (J vs doc1 = 8/12 = 0.667, J vs doc0 =
    4/14 = 0.286 < 0.5). If doc 1's shingles leaked into the index,
    doc 2 would be silently blocked by a doc that was never admitted;
    clean, doc 2 is admitted."""
    corpus = _docs(spark, [(0, "a b c d e f g h i j k l")])
    b1 = _docs(spark, [(1, "a b c d e f g h i j u v w x")])
    b2 = _docs(spark, [(2, "e f g h i j u v w x")])
    with _eng(spark) as eng:
        eng.build_dedup_index("nd", corpus, "doc_id", "text")
        d1 = eng.admit_against_dedup_index(
            "nd", b1, "doc_id", "text", threshold=0.5
        ).localCheckpoint()
        assert [(r["doc_id"], r["admitted"], r["blocked_by"]) for r in d1.collect()] == [
            (1, False, 0)
        ]
        eng.update_dedup_index("nd", b1, d1, "doc_id", "text")
        # no trace of the rejected doc in any index table
        assert spark.table(eng.qualified("nd_docs")).filter("doc = 1").count() == 0
        assert spark.table(eng.qualified("nd_entries")).filter("doc = 1").count() == 0
        d2 = eng.admit_against_dedup_index("nd", b2, "doc_id", "text", threshold=0.5)
        assert [(r["doc_id"], r["admitted"], r["blocked_by"]) for r in d2.collect()] == [
            (2, True, None)
        ]
