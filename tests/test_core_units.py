"""Unit tests for core modules: stacked, lang, preprocess, normalize,
negation, coref, linking, minhash, regex NER (pinned cases per the
reference's own test suites, e.g. regex.rs tests and lang.rs semantics)."""

from __future__ import annotations

from anno_ray.core import (
    coref,
    lang,
    linking,
    minhash,
    negation,
    normalize,
    preprocess,
    regex_ner,
    stacked,
)
from anno_ray.core.types import Mention, from_label, types_match_flexible


# --- RegexNER (cases mirror regex.rs unit tests) ----------------------------

def _texts(ms):
    return [(m.text, m.label) for m in ms]


def test_regex_dates():
    assert ("2024-01-15", "DATE") in _texts(regex_ner.extract("Meeting on 2024-01-15."))
    assert len([m for m in regex_ner.extract("Due by 12/31/2024 and 1/5/24.") if m.label == "DATE"]) == 2
    assert ("31.12.2024", "DATE") in _texts(regex_ner.extract("Released on 31.12.2024."))
    assert ("January 15, 2024", "DATE") in _texts(regex_ner.extract("On January 15, 2024 we met"))
    assert ("2024年1月15日", "DATE") in _texts(regex_ner.extract("会議は2024年1月15日です"))
    assert ("15. Januar 2024", "DATE") in _texts(regex_ner.extract("Am 15. Januar 2024 war es"))


def test_regex_times_money_percent():
    got = _texts(regex_ner.extract("Meet at 3:30 PM or 14:00; pay $1.5 million or 50 dollars; up 3.5%"))
    assert ("3:30 PM", "TIME") in got
    assert ("14:00", "TIME") in got
    assert ("$1.5 million", "MONEY") in got
    assert ("50 dollars", "MONEY") in got
    assert ("3.5%", "PERCENT") in got


def test_regex_contact_social():
    got = _texts(regex_ner.extract(
        "Email bob@acme.com, visit https://a.example/x, call (555) 123-4567, ping @bob.smith #news"
    ))
    assert ("bob@acme.com", "EMAIL") in got
    assert any(l == "URL" for _, l in got)
    assert ("(555) 123-4567", "PHONE") in got
    assert ("@bob.smith", "Mention") in got
    assert ("#news", "Hashtag") in got


def test_regex_first_claim_wins_overlap():
    # email claims the span first; phone-like digits inside are suppressed
    ms = regex_ner.extract("a12345@test1234.com")
    labels = [m.label for m in ms]
    assert labels.count("EMAIL") == 1
    assert sorted(m.start for m in ms) == sorted(set(m.start for m in ms))
    for a in ms:
        for b in ms:
            if a is not b:
                assert a.end <= b.start or a.start >= b.end  # no overlaps


def test_regex_sorted_by_start():
    ms = regex_ner.extract("On 2024-01-15 pay $5 at 3:30 PM to x@y.com")
    assert [m.start for m in ms] == sorted(m.start for m in ms)


# --- StackedNER -------------------------------------------------------------

def test_stacked_priority_regex_wins():
    # "May 15" is both a date (regex) and a capitalized span (heuristic)
    ms = stacked.extract("May 15, 2024 was when Smith visited.")
    date = [m for m in ms if m.label == "DATE"]
    assert date and date[0].source == "regex"
    # no overlapping mentions under Priority
    for a in ms:
        for b in ms:
            if a is not b:
                assert a.end <= b.start or a.start >= b.end


def test_stacked_clamping():
    def bogus_layer(text):
        return [
            Mention("x", "PER", 5, 999, 0.9),     # end clamped
            Mention("y", "PER", 30, 10, 0.9),     # invalid -> dropped
            Mention("z", "PER", 900, 950, 0.9),   # start beyond text -> dropped
        ]

    ms = stacked.extract("short text here", layers=[bogus_layer])
    assert len(ms) == 1 and ms[0].end == len("short text here")


def test_stacked_union_keeps_overlaps():
    ms = stacked.extract(
        "Email bob@acme.com now", strategy=stacked.UNION
    )
    assert any(m.label == "EMAIL" for m in ms)


# --- language detection -----------------------------------------------------

def test_lang_detection():
    assert lang.detect_language("hello world this is english") == "en"
    assert lang.detect_language("die straße ist schön über müller") == "de"
    assert lang.detect_language("это русский текст про москву") == "ru"
    assert lang.detect_language("日本語のテキストです") == "ja"
    assert lang.detect_language("中文文本没有假名") == "zh"
    assert lang.detect_language("한국어 텍스트 입니다") == "ko"
    assert lang.detect_language("") == "en"
    assert lang.detect_language("12345 !!!") == "en"
    # kanji + kana -> Japanese reclassification
    assert lang.detect_language("東京です") == "ja"


# --- preprocess -------------------------------------------------------------

def test_preprocess():
    assert preprocess.prepare("a​b") == "ab"
    assert preprocess.prepare("a\r\nb\rc") == "a\nb\nc"
    assert preprocess.prepare("a    b") == "a b"
    # newline runs collapse to one (the reference's ends_with('\n') guard);
    # the "paragraph" branch only fires after a space: "a \n b" -> "a \nb"
    assert preprocess.prepare("a\n\n\nb") == "a\nb"
    assert preprocess.prepare("a \n b") == "a \nb"
    assert preprocess.prepare("  x  ") == "x"


# --- normalize / similarity -------------------------------------------------

def test_normalize_and_similarity():
    assert normalize.normalize_entity_name("  Apple Inc  ") == "apple inc"
    assert normalize.string_similarity("Apple", "Apple") == 1.0
    assert normalize.string_similarity("Apple Inc", "Apple") == 0.8  # substring
    assert abs(normalize.jaccard_similarity("apple inc", "apple") - 0.5) < 1e-9
    assert normalize.string_similarity("", "") == 1.0
    assert normalize.string_similarity("a", "") == 0.0
    assert normalize.embedding_similarity([1.0, 0.0], [1.0, 0.0]) == 1.0
    assert abs(normalize.embedding_similarity([1.0, 0.0], [-1.0, 0.0])) < 1e-9


# --- negation / quantifier --------------------------------------------------

def test_negation_quantifier():
    t = "He did not attack the city"
    start = t.index("the city")
    assert negation.is_negated(t, start)
    assert negation.detect_quantifier(t, start) == ""
    assert negation.detect_quantifier("we saw every ", 13) == "universal"
    assert negation.detect_quantifier("we saw the ", 11) == "definite"


# --- coref ------------------------------------------------------------------

def test_coref_tracks_and_pronouns():
    text = "John Smith visited Paris. He liked it. John Smith returned."
    ms = stacked.extract(text)
    tracks, pronouns, assignment = coref.build_tracks(text, ms)
    # two "John Smith" mentions share one track
    js = [t for t in tracks if t.canonical_surface == "john smith"]
    assert len(js) == 1 and len([i for i in js[0].mention_idxs if i < len(ms)]) == 2
    # "He" linked to John Smith's track (male name)
    he = [p for p in pronouns if p.text == "He"]
    assert he and assignment.get(len(ms) + pronouns.index(he[0])) == js[0].track_id


def test_gender_lists():
    assert coref.is_likely_male("John Smith")
    assert not coref.is_likely_male("Mary Smith")
    assert coref.is_likely_female("Mary Smith")


# --- linking ----------------------------------------------------------------

def test_linking():
    assert linking.link_surface("barack obama")[0] == "Q76"
    assert linking.link_surface("Paris")[0] == "Q90"
    assert linking.link_surface("nobody special") == ("", "")


# --- minhash ----------------------------------------------------------------

def test_minhash_reference_parameters():
    sig = minhash.signature("hello world")
    assert len(sig) == 15  # 5 bands x 3 rows
    assert minhash.signature_similarity(sig, sig) == 1.0
    b = minhash.band_hashes(sig)
    assert len(b) == 5
    # near-identical strings collide in at least one band
    s2 = minhash.signature("hello world!")
    b2 = minhash.band_hashes(s2)
    assert any(x == y for x, y in zip(b, b2))
    # batch variant agrees with scalar variant
    import numpy as np

    bs = minhash.batch_signatures(["hello world", "abc"])
    assert list(bs[0]) == sig
    bb = minhash.batch_band_hashes(bs)
    assert list(bb[0]) == b


# --- label taxonomy ---------------------------------------------------------

def test_labels():
    assert from_label("B-PER") == "PER"
    assert from_label("ORGANIZATION") == "ORG"
    assert from_label("GPE") == "LOC"
    assert from_label("weird") == "WEIRD"
    assert types_match_flexible("PER", "PERSON")
    assert types_match_flexible("DATE", "YEAR")
    assert not types_match_flexible("PER", "ORG")


# --- type mapper presets -----------------------------------------------------

def test_type_mapper():
    from anno_ray.core.type_mapper import PRESETS, TypeMapper

    tm = TypeMapper.mit_movie()
    assert tm.normalize("ACTOR") == "PER"
    assert tm.normalize("actor") == "PER"  # case-insensitive
    assert tm.normalize("TITLE") == "WORK_OF_ART"
    assert tm.normalize("UNMAPPED_ORG") == "UNMAPPED_ORG"
    assert tm.normalize("organization") == "ORG"  # from_label fallback
    assert "ACTOR" in tm and "NOPE" not in tm
    assert set(PRESETS) == {
        "mit_movie", "mit_restaurant", "biomedical", "social_media", "manufacturing"
    }
    assert PRESETS["social_media"]().normalize("corporation") == "ORG"


# --- coref golden (captured from the compiled reference resolve_coreference) --

def test_coref_golden_partition():
    import json
    import os

    from anno_ray.core.types import Mention

    path = os.path.join(os.path.dirname(__file__), "golden", "coref_tracks.json")
    with open(path, encoding="utf-8") as f:
        cases = json.load(f)
    for case in cases:
        ents = [Mention(e["text"], e["label"], e["start"], e["end"], e["conf"]) for e in case["entities"]]
        tracks, pronouns, _ = coref.build_tracks(case["text"], ents)
        allm = ents + pronouns
        mine = sorted(
            f"{t.canonical_surface}|"
            + ",".join(f"{a}:{b}" for a, b in sorted((allm[i].start, allm[i].end) for i in t.mention_idxs))
            for t in tracks
        )
        assert mine == case["ref_tracks"], case["text"][:80]


# --- stacked multi-overlap quirks (stacked.rs:653-744 semantics) -------------

def _layer(ms):
    return lambda text: [Mention(*m) for m in ms]


def test_stacked_multi_overlap_priority_removes_others():
    """Priority + multi-overlap: candidate is dropped AND the non-best
    existing overlapping entities are removed (reference behavior)."""
    l1 = _layer([("a", "PER", 0, 5, 0.9), ("b", "ORG", 6, 10, 0.9)])
    l2 = _layer([("c", "LOC", 3, 8, 0.9)])  # overlaps both
    ms = stacked.extract("0123456789xyz", layers=[l1, l2], strategy=stacked.PRIORITY)
    assert [(m.text, m.label) for m in ms] == [("a", "PER")]  # b removed, c dropped


def test_stacked_multi_overlap_longest_span():
    l1 = _layer([("a", "PER", 0, 4, 0.9), ("b", "ORG", 5, 8, 0.9)])
    l2 = _layer([("c", "LOC", 0, 9, 0.5)])  # longer than both
    ms = stacked.extract("0123456789xyz", layers=[l1, l2], strategy=stacked.LONGEST_SPAN)
    assert [(m.text, m.label) for m in ms] == [("c", "LOC")]


def test_stacked_multi_overlap_highest_conf():
    l1 = _layer([("a", "PER", 0, 4, 0.6), ("b", "ORG", 5, 8, 0.7)])
    l2 = _layer([("c", "LOC", 2, 7, 0.95)])
    ms = stacked.extract("0123456789xyz", layers=[l1, l2], strategy=stacked.HIGHEST_CONF)
    assert [(m.text, m.label) for m in ms] == [("c", "LOC")]
    # lower-conf candidate loses; others still removed
    l2b = _layer([("c", "LOC", 2, 7, 0.1)])
    ms = stacked.extract("0123456789xyz", layers=[l1, l2b], strategy=stacked.HIGHEST_CONF)
    assert [(m.text, m.label) for m in ms] == [("b", "ORG")]  # best kept, a removed


def test_stacked_union_keeps_everything():
    l1 = _layer([("a", "PER", 0, 4, 0.6), ("b", "ORG", 5, 8, 0.7)])
    l2 = _layer([("c", "LOC", 2, 7, 0.95)])
    ms = stacked.extract("0123456789xyz", layers=[l1, l2], strategy=stacked.UNION)
    assert len(ms) == 3


def test_stacked_dedup_same_span_and_type():
    l1 = _layer([("x", "PER", 0, 3, 0.6)])
    l2 = _layer([("x", "PER", 0, 3, 0.9)])
    # Priority: second layer's identical span overlaps -> dropped anyway
    ms = stacked.extract("0123456789", layers=[l1, l2])
    assert len(ms) == 1 and ms[0].conf == 0.6
