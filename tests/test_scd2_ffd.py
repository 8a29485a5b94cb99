"""SCD Type 2 history + FFD packing goldens."""

from __future__ import annotations

from cbts_datalake_synnex_spark.operators.cdc import scd2_from_log
from cbts_datalake_synnex_spark.operators.packing import ffd_pack


def _feed(spark, rows):
    return spark.createDataFrame(rows, "k bigint, name string, seq bigint, op string")


def test_scd2_versions_and_delete_semantics(spark):
    rows = [
        (1, "a1", 1, "I"), (1, "a2", 3, "U"), (1, "a3", 5, "U"),   # live chain
        (2, "b1", 1, "I"), (2, None, 4, "D"),                      # deleted key
        (3, "c1", 2, "I"), (3, None, 4, "D"), (3, "c2", 6, "I"),   # reopened key
    ]
    hist = {
        (r["k"], r["valid_from"]): (r["name"], r["valid_to"], r["is_current"])
        for r in scd2_from_log(_feed(spark, rows), ["k"], "seq", op_col="op").collect()
    }
    assert hist[(1, 1)] == ("a1", 3, False)
    assert hist[(1, 3)] == ("a2", 5, False)
    assert hist[(1, 5)] == ("a3", None, True)
    # delete closed b1 at seq 4 and key 2 has NO current row
    assert hist[(2, 1)] == ("b1", 4, False)
    assert not any(k == 2 and cur for (k, _), (_, _, cur) in hist.items())
    # key 3 reopened after its delete
    assert hist[(3, 2)] == ("c1", 4, False)
    assert hist[(3, 6)] == ("c2", None, True)
    assert len(hist) == 6  # delete events themselves are not emitted


def test_scd2_without_op_col_keeps_every_event(spark):
    rows = [(1, "x", 1, "I"), (1, "y", 2, "I")]
    out = scd2_from_log(_feed(spark, rows), ["k"], "seq").collect()
    assert len(out) == 2
    assert sum(1 for r in out if r["is_current"]) == 1


def test_ffd_respects_budget_and_packs_once(spark):
    docs = spark.createDataFrame(
        [(i, 0, "w " * (10 * (i % 5 + 1))) for i in range(40)],
        "doc_id bigint, shard int, text string",
    )
    out = ffd_pack(docs, "text", "shard", "doc_id", budget=60).collect()
    assert len(out) == 40 and len({r["doc_id"] for r in out}) == 40
    fills: dict = {}
    for r in out:
        assert not r["oversize"]
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["tokens"]
    assert all(v <= 60 for v in fills.values())


def test_ffd_beats_one_doc_per_bin(spark):
    # 6 docs of 30 + 6 of 20 into budget 60 => FFD needs 5 bins (30+30, 20x3...)
    docs = spark.createDataFrame(
        [(i, 0, "w " * 30) for i in range(6)] + [(10 + i, 0, "w " * 20) for i in range(6)],
        "doc_id bigint, shard int, text string",
    )
    out = ffd_pack(docs, "text", "shard", "doc_id", budget=60).collect()
    n_bins = len({r["bin_id"] for r in out})
    assert n_bins == 5  # three (30,30) bins + two (20,20,20) bins


def test_ffd_oversize_doc_gets_own_flagged_bin(spark):
    docs = spark.createDataFrame(
        [(0, 0, "w " * 100), (1, 0, "w " * 10)], "doc_id bigint, shard int, text string"
    )
    out = {r["doc_id"]: r for r in ffd_pack(docs, "text", "shard", "doc_id", budget=50).collect()}
    assert out[0]["oversize"] is True
    assert out[1]["oversize"] is False
    assert out[0]["bin_id"] != out[1]["bin_id"]


def test_ffd_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, i % 3, "w " * (i % 17 + 1)) for i in range(60)],
        "doc_id bigint, shard int, text string",
    )
    a = ffd_pack(docs, "text", "shard", "doc_id", budget=40)
    b = ffd_pack(docs.repartition(11), "text", "shard", "doc_id", budget=40)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- fim_split (round 8) ---------------------------------------------------


def _fim_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fim_split_is_lossless_on_hostile_text(spark):
    from cbts_datalake_synnex_spark.operators.packing import fim_split

    rows = [
        (1, "plain ascii text here"),
        (2, ""),
        (3, "x"),
        (4, "école naïve — combining ẛ̣ chars 가각"),
        (5, "tabs\tand\nnewlines\r\nand  spaces"),
    ]
    out = fim_split(_fim_df(spark, rows), "doc_id", "text", rate=1.0).collect()
    assert len(out) == 5
    for r in out:
        assert r["fim"] and r["mode"] in ("psm", "spm")
        assert r["lossless"]
        assert 0 <= r["a"] <= r["b"]
        want = dict(rows)[r["doc_id"]]
        assert r["prefix"] + r["middle"] + r["suffix"] == want


def test_fim_split_rate_gates_and_plain_passthrough(spark):
    from cbts_datalake_synnex_spark.operators.packing import fim_split

    rows = [(i, f"document number {i} with some text") for i in range(40)]
    none = fim_split(_fim_df(spark, rows), "doc_id", "text", rate=0.0).collect()
    assert all(not r["fim"] and r["mode"] == "plain" for r in none)
    # plain examples pass through whole: prefix = text, middle/suffix empty
    assert all(r["middle"] == "" and r["suffix"] == "" and r["lossless"] for r in none)
    half = fim_split(_fim_df(spark, rows), "doc_id", "text", rate=0.5).collect()
    n_fim = sum(r["fim"] for r in half)
    assert 0 < n_fim < 40  # the md5 gate actually splits the corpus
    modes = {r["mode"] for r in half if r["fim"]}
    assert modes <= {"psm", "spm"}


def test_fim_split_partitioning_and_rerun_invariant(spark):
    from cbts_datalake_synnex_spark.operators.packing import fim_split

    rows = [(i, f"text {i} " * (i % 5 + 1)) for i in range(30)]
    df = _fim_df(spark, rows)
    a = sorted(map(tuple, fim_split(df, "doc_id", "text").collect()))
    b = sorted(map(tuple, fim_split(df.repartition(11), "doc_id", "text").collect()))
    assert a == b


# --- chat_assembly (round 8) -------------------------------------------------


def test_chat_assembly_template_and_mask(spark):
    from cbts_datalake_synnex_spark.operators.packing import chat_assembly

    df = spark.createDataFrame(
        [
            ("c1", 2, "hello"),     # pos 0 -> user
            ("c1", 5, "hi there"),  # pos 1 -> assistant (trainable)
            ("c1", 9, "thanks"),    # pos 2 -> user
            ("c2", 1, "solo"),      # single-turn conv, nothing trainable
        ],
        "conv string, o bigint, text string",
    )
    out = {r["conv"]: r for r in chat_assembly(df, "conv", "o", "text").collect()}
    import hashlib

    want_c1 = "<|user|>\nhello\n<|assistant|>\nhi there\n<|user|>\nthanks"
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["total_chars"] == len(want_c1)
    assert out["c1"]["trainable_chars"] == len("hi there")
    assert out["c1"]["sha"] == hashlib.sha256(want_c1.encode()).hexdigest()
    assert out["c2"]["n_turns"] == 1 and out["c2"]["trainable_chars"] == 0


def test_chat_assembly_order_and_partitioning_invariant(spark):
    from cbts_datalake_synnex_spark.operators.packing import chat_assembly

    rows = [(f"c{i % 4}", i, f"turn {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "conv string, o bigint, text string")
    a = sorted(map(tuple, chat_assembly(df, "conv", "o", "text").collect()))
    b = sorted(
        map(tuple, chat_assembly(df.repartition(13), "conv", "o", "text").collect())
    )
    assert a == b


def test_preference_pairs_extremes_ties_and_margin_filter(spark):
    from cbts_datalake_synnex_spark.operators.packing import preference_pairs

    df = spark.createDataFrame(
        [
            # p1: clear extremes
            (1, 10, 0.9), (1, 11, 0.2), (1, 12, 0.5),
            # p2: tie at the top (ids 20 < 21) and at the bottom (30 < 31)
            (2, 21, 0.8), (2, 20, 0.8), (2, 31, 0.1), (2, 30, 0.1),
            # p3: all tied -> margin 0 -> dropped
            (3, 40, 0.5), (3, 41, 0.5),
            # p4: single candidate -> chosen == rejected -> dropped
            (4, 50, 0.7),
        ],
        "prompt_id bigint, cand_id bigint, score double",
    )
    out = {
        r["prompt_id"]: r
        for r in preference_pairs(df, "prompt_id", "cand_id", "score").collect()
    }
    assert set(out) == {1, 2}
    assert (out[1]["chosen_id"], out[1]["rejected_id"]) == (10, 11)
    assert out[1]["n_candidates"] == 3
    assert abs(out[1]["margin"] - 0.7) < 1e-9
    # ties break to the LOWEST id on both sides
    assert (out[2]["chosen_id"], out[2]["rejected_id"]) == (20, 30)


def test_preference_pairs_partitioning_invariant(spark):
    from cbts_datalake_synnex_spark.operators.packing import preference_pairs

    rows = [(i % 7, i, float((i * 37) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "p bigint, i bigint, score double")
    a = sorted(map(tuple, preference_pairs(df, "p", "i", "score").collect()))
    b = sorted(
        map(tuple, preference_pairs(df.repartition(13), "p", "i", "score").collect())
    )
    assert a == b and len(a) > 0


def test_span_corrupt_lossless_and_partition_invariant(spark):
    """Round 11: substituting each sentinel in `corrupted` with its
    span from `target` reconstructs the original text exactly; output
    is partitioning-invariant; rate 0 passes text through."""
    import re

    from cbts_datalake_synnex_spark.operators.packing import span_corrupt

    docs = [
        (i, " ".join(f"w{i}_{k}" for k in range((i * 7) % 40 + 1)))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in span_corrupt(
        df, "doc_id", "text", block=8, span_len=3, rate_pct=60
    ).collect()}
    assert any(r["n_spans"] > 0 for r in out.values())
    for i, text in docs:
        r = out[i]
        spans = {}
        if r["target"]:
            body = r["target"].removesuffix(" <extra_id_end>")
            for part in re.split(r"(?=<extra_id_\d+>)", body):
                if not part:
                    continue
                sid, toks = part.strip().split(">", 1)
                spans[sid + ">"] = toks.strip()
        rebuilt = " ".join(
            spans.get(tok, tok) for tok in r["corrupted"].split(" ") if tok != ""
        )
        assert rebuilt == text, (i, r["corrupted"], r["target"])
        assert r["n_spans"] == len(spans)
    a = sorted(map(tuple, span_corrupt(df, "doc_id", "text", rate_pct=60).collect()))
    b = sorted(
        map(
            tuple,
            span_corrupt(df.repartition(7), "doc_id", "text", rate_pct=60).collect(),
        )
    )
    assert a == b
    zero = span_corrupt(df, "doc_id", "text", rate_pct=0).collect()
    assert all(r["n_spans"] == 0 and r["target"] == "" for r in zero)
    got = {r["doc_id"]: r["corrupted"] for r in zero}
    assert all(got[i] == t for i, t in docs)


def test_needle_insert_lossless_and_deterministic(spark):
    """Round 12: dropping the needle token restores the original
    text; position/needle are pure functions of the id."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.packing import needle_insert

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(1, 8 + i))) for i in range(5)],
        "doc_id bigint, text string",
    )
    out = needle_insert(df, "doc_id", "text")
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, needle_insert(df, "doc_id", "text").collect()))
    assert a == b  # deterministic
    joined = out.join(df, "doc_id")
    restored = joined.select(
        "doc_id",
        F.array_join(
            F.filter(
                F.split("out_text", " "), lambda t: ~t.startswith("NEEDLE-")
            ),
            " ",
        ).alias("back"),
        "text",
    )
    assert restored.filter(F.col("back") != F.col("text")).count() == 0
    # needle present exactly once, at the declared position
    for r in out.join(df, "doc_id").collect():
        toks = r["out_text"].split(" ")
        assert toks.count(r["needle"]) == 1
        assert toks[r["insert_pos"] - 1] == r["needle"]
        assert 0.0 <= r["depth_frac"] <= 1.0
