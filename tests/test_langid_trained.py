"""Held-out accuracy gate for the trained in-engine language ID
(round 13): the char-bigram NB classifier must actually separate the
corpus's five languages, not merely run. Also pins the ExactSubstr
span semantics on a hand-built corpus."""

from pyspark.sql import functions as F


def test_langid_heldout_accuracy_gate(spark):
    from cbts_datalake_synnex_spark.workload import REGISTRY

    out = REGISTRY["x4_langid_trained"].fn(spark, "/root/testdata/sf0.01")
    rows = {r["lang"]: r for r in out.collect()}
    assert set(rows) == {"en", "es", "fr", "de", "zh"}
    total = sum(r["n_test"] for r in rows.values())
    correct = sum(r["n_correct"] for r in rows.values())
    # overall held-out accuracy gate: the marker vocabulary separates
    # these languages; char bigrams must recover that signal
    assert correct / total >= 0.90, f"overall accuracy {correct/total:.3f}"
    # zh is CJK — bigram disjoint from the latin languages
    assert rows["zh"]["accuracy"] >= 0.95


def test_exact_substring_spans_hand_corpus(spark):
    from cbts_datalake_synnex_spark.operators.dedup import exact_substring_spans

    boiler = "0123456789" * 4  # 40 chars, shared verbatim
    docs = spark.createDataFrame(
        [
            (1, "A" * 10 + boiler + "B" * 10),   # first occurrence: kept
            (2, "C" * 5 + boiler + "D" * 25),    # later occurrence: removed
            (3, "E" * 60),                        # unique text: no spans
            (4, "short"),                         # below min_len: no grams
        ],
        "doc_id bigint, text string",
    )
    spans = exact_substring_spans(docs, "doc_id", "text", min_len=20).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2's whole boilerplate block is one removal span (every gram
    # in it first occurred in doc 1): starts at char 6, 40 chars wide.
    # Its D*25 tail self-repeats (grams 47..51 repeat gram 46), so a
    # second within-doc span [47, 71) follows — Lee et al. semantics.
    assert 2 in by_doc and len(by_doc[2]) == 2
    s2a, s2b = sorted(by_doc[2], key=lambda r: r["span_start"])
    assert s2a["span_start"] == 6 and s2a["span_end"] == 6 + 40
    assert s2a["span_chars"] == 40
    assert s2b["span_start"] == 47 and s2b["span_end"] == 71
    # doc 1 keeps the corpus-first copy of the block, but the block's
    # internal 10-char period makes positions 21..31 repeat position
    # 11's grams — within-doc repeats dedup too (Lee et al. semantics)
    assert 1 in by_doc and len(by_doc[1]) == 1
    assert by_doc[1][0]["span_start"] == 21 and by_doc[1][0]["span_end"] == 51
    # doc 3: "E"*60 self-repeats its 20-gram at positions 2..41 -> [2, 61)
    assert 3 in by_doc and len(by_doc[3]) == 1
    assert by_doc[3][0]["span_start"] == 2 and by_doc[3][0]["span_end"] == 61
    # doc 4 is below min_len: no grams, no spans
    assert 4 not in by_doc


def test_exact_substring_within_doc_repeats(spark):
    from cbts_datalake_synnex_spark.operators.dedup import exact_substring_spans

    docs = spark.createDataFrame(
        [(7, "x" * 50)], "doc_id bigint, text string"
    )
    spans = exact_substring_spans(docs, "doc_id", "text", min_len=20).collect()
    assert len(spans) == 1
    s = spans[0]
    # grams at pos 2..31 are repeats of pos 1's gram -> span [2, 51)
    assert s["span_start"] == 2 and s["span_end"] == 51
