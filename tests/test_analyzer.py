"""Pin the vendored analyzer with golden tokens (FIXTURES.md §4) and the
reference golden document frequencies (app/tests/final_ii.py:73-84)."""

from collections import defaultdict

from pyfuseray.analyzer import Analyzer
from pyfuseray.porter2 import stem
from tests.corpora import PANGRAM_DOCS, PANGRAM_GOLDEN_DF


def test_golden_tokens_pangram():
    a = Analyzer()
    assert a.process_text("The quick brown foxes jump over the lazy dogs") == [
        "quick", "brown", "fox", "jump", "lazi", "dog",
    ]


def test_contraction_and_stoplist_order():
    # Stoplist runs BEFORE punctuation strip: "don't" tokenizes to
    # [do, n't]; "do" dies in the stoplist (it IS in the 430-word list),
    # "n't" survives the stoplist then strips to "nt".
    a = Analyzer()
    assert a.process_text("Don't stop the music!") == ["nt", "stop", "music"]
    assert a.process_text("Isn't it wonderful?") == ["nt", "wonder"]


def test_golden_tokens_flowers():
    a = Analyzer()
    assert a.process_text("Flowers bloom in abundance") == ["flower", "bloom", "abund"]


def test_query_drops_single_char_tokens():
    a = Analyzer()
    assert a.preprocess_query("a I flowers") == {"flower": 1}


def test_build_side_keeps_single_char_tokens():
    # Every letter a-z is in the 430-word stoplist, so the only 1-char
    # tokens that can reach the index are digits. The build side keeps
    # them (no length filter in processText); the query side drops them.
    a = Analyzer()
    assert a.process_text("5 7 flowers") == ["5", "7", "flower"]
    assert a.preprocess_query("5 7 flowers") == {"flower": 1}


def test_stemmer_known_pairs():
    pairs = {
        "running": "run", "flies": "fli", "dogs": "dog", "cats": "cat",
        "quickly": "quick", "boxes": "box", "boxing": "box",
        "wizards": "wizard", "jumped": "jump", "jumping": "jump",
        "blooming": "bloom", "bloomed": "bloom", "flowers": "flower",
        "lazy": "lazi", "zebras": "zebra", "gardens": "garden",
        "abundance": "abund", "national": "nation", "rational": "ration",
        "generously": "generous", "conditional": "condit",
        "sky": "sky", "news": "news", "dying": "die", "lying": "lie",
        "early": "earli", "only": "onli", "proceed": "proceed",
        "exceed": "exceed", "inning": "inning", "ties": "tie",
        "cries": "cri", "gas": "gas", "gaps": "gap", "kiwis": "kiwi",
        "hopeful": "hope", "happiness": "happi", "relational": "relat",
    }
    for word, expected in pairs.items():
        assert stem(word) == expected, f"{word} -> {stem(word)} != {expected}"


def test_golden_df_pangram_via_analyzer():
    """df computed with the vendored analyzer matches the reference goldens."""
    a = Analyzer()
    df = defaultdict(int)
    for doc in PANGRAM_DOCS:
        for term in set(a.process_text(doc)):
            df[term] += 1
    for term, expected in PANGRAM_GOLDEN_DF.items():
        assert df[term] == expected, f"df({term})={df[term]} != {expected}"
