"""Text analysis chain: tokenize -> stopwords -> punctuation strip -> stem.

Replicates the reference chain (reference ``app/TextPreProcess.py:41-51``):

1. ``nltk.word_tokenize(text.lower())``  -> vendored regex tokenizer that
   lowercases and splits English contractions (``don't`` -> ``do``, ``n't``)
   the way the Treebank tokenizer does for the cases that matter here.
2. stopword filter (430-word list, ``app/data/stopList.txt``) — runs
   BEFORE punctuation strip (reference ``app/TextPreProcess.py:44-47``),
   so ``n't`` survives the stoplist and is later stripped to ``nt``.
3. punctuation strip ``re.sub(r'\\W+', '', tok)``, dropping empties
   (reference ``app/TextPreProcess.py:32-33``).
4. Porter2 (Snowball English) stem (reference ``app/TextPreProcess.py:38-39``).

Query-side analysis additionally drops tokens with ``len(tok) <= 1``
(reference ``app/TextPreProcess.py:64``) — an asymmetry vs the build side
that we replicate exactly (SURVEY.md §2.9.4).

The analyzer is deliberately a plain picklable object so Ray actor pools
can construct it once per worker (``__init__``) and reuse it per batch.
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path

from pyfuseray.porter2 import stem

_STOPLIST_PATH = Path(__file__).parent / "data" / "stopList.txt"

# Split contractions off the preceding word: "don't" -> "do n't",
# "it's" -> "it 's". The pieces then tokenize separately.
_CONTRACTION_NT = re.compile(r"(\w)(n't)\b")
_CONTRACTION_APO = re.compile(r"(\w)('(?:s|ll|re|ve|d|m))\b")
# Token = run of word chars (possibly with internal apostrophe remnants
# handled above) or a run of non-word non-space chars (punctuation tokens,
# which die later in the \W+ strip — but only AFTER the stoplist, matching
# the reference order).
_TOKEN = re.compile(r"n't|'(?:s|ll|re|ve|d|m)\b|\w+|[^\w\s]+")
_NON_WORD = re.compile(r"\W+")


def load_stoplist(path: str | Path = _STOPLIST_PATH) -> frozenset[str]:
    """Load the stopword list (one lowercase word per line)."""
    with open(path, encoding="utf-8") as fh:
        return frozenset(line.strip().lower() for line in fh if line.strip())


class Analyzer:
    """Deterministic, dependency-free analyzer (build + query sides)."""

    # Cap on the per-instance stem memo (web-scale vocab is zipfian: a
    # bounded cache catches nearly all hits without unbounded growth).
    _STEM_CACHE_MAX = 500_000

    def __init__(self, stoplist: frozenset[str] | None = None):
        self.stoplist = stoplist if stoplist is not None else load_stoplist()
        self._stem_cache: dict[str, str] = {}
        # raw token -> final term (or None if dropped): collapses the
        # stoplist + punctuation-strip + stem chain to one dict hit for
        # the (zipfian) repeating tokens of the hot build path
        self._token_cache: dict[str, str | None] = {}

    # -- stages ------------------------------------------------------------
    def tokenize(self, text: str) -> list[str]:
        text = text.lower()
        # both contraction patterns require an apostrophe: skip the two
        # regex passes (a measurable cost on the hot build path) for the
        # common apostrophe-free document
        if "'" in text:
            text = _CONTRACTION_NT.sub(r"\1 \2", text)
            text = _CONTRACTION_APO.sub(r"\1 \2", text)
        return _TOKEN.findall(text)

    def remove_stopwords(self, tokens: list[str]) -> list[str]:
        sl = self.stoplist
        return [t for t in tokens if t not in sl]

    @staticmethod
    def strip_punctuation(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            t = _NON_WORD.sub("", t)
            if t:
                out.append(t)
        return out

    def stem_tokens(self, tokens: list[str]) -> list[str]:
        cache = self._stem_cache
        out = []
        for t in tokens:
            s = cache.get(t)
            if s is None:
                s = stem(t)
                if len(cache) < self._STEM_CACHE_MAX:
                    cache[t] = s
            out.append(s)
        return out

    # -- chains ------------------------------------------------------------
    def process_text(self, text: str) -> list[str]:
        """Build-side chain (keeps 1-char tokens).

        Semantically identical to
        ``stem(strip_punct(stop(tokenize(text))))`` but with the
        per-token tail memoized (same result, one dict hit per repeat).
        """
        out: list[str] = []
        cache = self._token_cache
        stoplist = self.stoplist
        for tok in self.tokenize(text):
            if tok in cache:
                r = cache[tok]
            else:
                if tok in stoplist:
                    r = None
                else:
                    stripped = _NON_WORD.sub("", tok)
                    r = self.stem_tokens([stripped])[0] if stripped else None
                if len(cache) < self._STEM_CACHE_MAX:
                    cache[tok] = r
            if r is not None:
                out.append(r)
        return out

    def term_frequencies(self, text: str) -> dict[str, int]:
        """Build-side per-document term frequencies."""
        return dict(Counter(self.process_text(text)))

    def preprocess_query(self, text: str) -> dict[str, int]:
        """Query-side chain: drops single-char tokens (reference asymmetry)."""
        freq: Counter[str] = Counter()
        for tok in self.process_text(text):
            if len(tok) > 1:
                freq[tok] += 1
        return dict(freq)


_SIMPLE_TOKEN = re.compile(r"[a-z0-9]+")


class SimpleAnalyzer:
    """SQL-mirrorable analyzer: lowercase + ``[a-z0-9]+`` runs. No
    stoplist, no stemming, symmetric build/query sides.

    Exists so the FULL production path — tokenize -> SPIMI runs ->
    segment merge -> df/avgdl/doclen stats -> BM25 scoring -> top-k —
    can be hash-checked value-for-value against a DuckDB oracle
    (``regexp_extract_all(lower(text), '[a-z0-9]+')``), which cannot
    express the reference chain's Treebank contractions / stoplist /
    Porter2 steps. Same duck-typed interface as :class:`Analyzer`.
    """

    def tokenize(self, text: str) -> list[str]:
        return _SIMPLE_TOKEN.findall(text.lower())

    def process_text(self, text: str) -> list[str]:
        return self.tokenize(text)

    def term_frequencies(self, text: str) -> dict[str, int]:
        return dict(Counter(self.tokenize(text)))

    def preprocess_query(self, text: str) -> dict[str, int]:
        return dict(Counter(self.tokenize(text)))


# analyzer-mode registry: the mode is recorded in the index manifest so
# the query side always analyzes with the chain the index was built with
ANALYZERS: dict[str, type] = {"reference": Analyzer, "simple": SimpleAnalyzer}


def make_analyzer(name: str = "reference"):
    """Construct an analyzer by manifest mode name."""
    try:
        return ANALYZERS[name]()
    except KeyError:
        raise ValueError(f"unknown analyzer mode {name!r}; known: {sorted(ANALYZERS)}")
