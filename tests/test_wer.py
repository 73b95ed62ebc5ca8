"""WER harness math (tools/wer_check.py): normalization, edit distance,
corpus WER, and the quantization promotion rule — all hermetic (the engine-
driving half needs real weights, which this image does not ship)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from wer_check import (  # noqa: E402
    check_promotion, corpus_wer, edit_distance, normalize_text,
)


def test_normalize_strips_case_punct_diacritics():
    assert normalize_text("Hello, World!") == ["hello", "world"]
    assert normalize_text("  don't   STOP ") == ["don't", "stop"]
    assert normalize_text("café") == ["cafe"]


def test_normalize_cjk_chars_split():
    # zh/ja segment per character (CER-style)
    assert normalize_text("你好world") == ["你", "好", "world"]


def test_edit_distance_basics():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a", "b"]) == 2
    assert edit_distance("the cat sat".split(), "the cat sat".split()) == 0
    # one substitution + one insertion
    assert edit_distance("the cat sat".split(), "the bat sat down".split()) == 2


def test_corpus_wer_pools_edits_not_rates():
    # file 1: 0/8 errors; file 2: 2/2 errors -> corpus 2/10 = 20%,
    # NOT the mean of per-file rates (0% and 100% -> 50%)
    pairs = [("one two three four five six seven eight",
              "one two three four five six seven eight"),
             ("nine ten", "wrong words")]
    r = corpus_wer(pairs)
    assert r["ref_words"] == 10
    assert abs(r["wer_pct"] - 20.0) < 1e-9
    assert r["per_file_pct"] == [0.0, 100.0]


def test_promotion_rule():
    base = {"wer_pct": 5.0, "per_file_pct": [4.0, 6.0]}
    good = {"wer_pct": 5.05, "per_file_pct": [4.5, 6.1]}
    bad_corpus = {"wer_pct": 5.3, "per_file_pct": [5.0, 6.0]}
    bad_file = {"wer_pct": 5.02, "per_file_pct": [4.0, 7.5]}
    assert check_promotion(base, good)["promote"]
    assert not check_promotion(base, bad_corpus)["promote"]
    assert not check_promotion(base, bad_file)["promote"]


def test_empty_reference_counts_insertions():
    r = corpus_wer([("", "spurious output")])
    assert r["wer_pct"] > 0
