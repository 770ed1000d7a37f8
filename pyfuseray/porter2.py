"""Vendored pure-Python Porter2 (Snowball English) stemmer.

Implemented from the published algorithm description at
snowballstem.org/algorithms/english/stemmer.html (public). The reference
engine uses ``nltk.stem.snowball.SnowballStemmer("english")``
(reference ``app/TextPreProcess.py:13``), which implements the same
published algorithm; nltk is not available in this sandbox, so we vendor
the algorithm. Conformance of the whole engine is defined against the
serial oracle (``pyfuseray.oracle``), which uses this same stemmer, and
the stemmer itself is pinned by golden-token tests (tests/test_analyzer.py)
derived from the reference's golden document frequencies
(reference ``app/tests/final_ii.py:73-84``).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_VALID_LI = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTION2 = frozenset({
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
})

_STEP2_SUFFIXES = (
    # (suffix, replacement) — searched longest-first
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
)

_STEP3_SUFFIXES = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
)

_STEP4_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS


def _r1_start(word: str) -> int:
    """R1 = region after the first non-vowel following a vowel."""
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    for i in range(1, len(word)):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            return i + 1
    return len(word)


def _r2_start(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable.

    Short syllable: (a) vowel followed by a non-vowel other than w, x or Y,
    preceded by a non-vowel; or (b) a vowel at the beginning of the word
    followed by a non-vowel.
    """
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            not _is_vowel(a)
            and _is_vowel(b)
            and not _is_vowel(c)
            and c not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(s: str) -> bool:
    return any(_is_vowel(ch) for ch in s)


def stem(word: str) -> str:
    """Stem one lowercase word with the Porter2 (Snowball English) algorithm."""
    if len(word) <= 2:
        return word

    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word

    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc

    # Mark consonant-y as 'Y' so it is not treated as a vowel.
    if word[0] == "y":
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
    word = "".join(chars)

    r1 = _r1_start(word)
    r2 = _r2_start(word, r1)

    # Step 0: strip apostrophe suffixes.
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a.
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _has_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # Step 1b (longest suffix match).
    suffix = None
    for suf in ("ingly", "edly", "eedly", "eed", "ing", "ed"):
        if word.endswith(suf):
            if suffix is None or len(suf) > len(suffix):
                suffix = suf
    if suffix in ("eed", "eedly"):
        if len(word) - len(suffix) >= r1:
            word = word[: -len(suffix)] + "ee"
    elif suffix is not None:
        stem_part = word[: -len(suffix)]
        if _has_vowel(stem_part):
            word = stem_part
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_DOUBLES):
                word = word[:-1]
            elif _is_short(word, r1):
                word += "e"

    # Step 1c: y/Y -> i when preceded by a non-vowel that is not the
    # first letter of the word.
    if (
        len(word) > 2
        and word[-1] in "yY"
        and not _is_vowel(word[-2])
    ):
        word = word[:-1] + "i"

    # Step 2 (condition: suffix in R1).
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _VALID_LI:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (condition: suffix in R1; 'ative' additionally needs R2).
    for suf, repl in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (condition: suffix in R2).
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5.
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")
