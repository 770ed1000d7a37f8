"""Reference CSV pipeline parity: songs-style CSV with multi-field text
concatenation, keep-first dedup, index build, rank identity."""

import csv

import pytest

from pyfuseray.build import build_index
from pyfuseray.oracle import OracleIndex
from pyfuseray.pipeline import csv_to_corpus
from pyfuseray.query import IndexSearcher

SONGS = [
    # (track_id, track_name, track_artist, lyrics)
    ("t1", "Quick Fox", "The Zephyrs", "the quick brown foxes jump over lazy dogs"),
    ("t2", "Flower Song", "Spring Band", "flowers bloom in the spring garden"),
    ("t3", "Wizard Waltz", "Quartz", "five boxing wizards jumped quickly"),
    ("t2", "Flower Song DUP", "Spring Band", "this duplicate row must be dropped"),
    ("t4", "Night Run", "Dogs", "running dogs chase playing cats nightly"),
]


@pytest.fixture(scope="module")
def songs_csv(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "songs.csv")
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["track_id", "track_name", "track_artist", "lyrics"])
        w.writerows(SONGS)
    return path


def test_csv_corpus_and_rank_identity(songs_csv, tmp_path):
    corpus = csv_to_corpus(
        songs_csv,
        text_columns=["track_name", "track_artist", "lyrics"],
        dedup_column="track_id",
    )
    rows = sorted(corpus.to_pandas().itertuples(index=False), key=lambda r: r.doc_id)
    assert len(rows) == 4  # t2 dup dropped
    texts = [r.text for r in rows]
    assert any("Quick Fox The Zephyrs" in t for t in texts)  # ' '-joined fields
    assert not any("duplicate row" in t for t in texts)  # keep-first by track_id

    out = str(tmp_path / "ix")
    build_index(corpus, out, num_buckets=2, overwrite=True)
    searcher = IndexSearcher(out)
    oracle = OracleIndex().build([(r.doc_id, r.text) for r in rows])
    for q in ["quick fox", "flower spring", "wizard", "dogs"]:
        got = searcher.search_tfidf(q, 4)
        want = oracle.search_tfidf(q, 4)
        assert [d for d, _ in got] == [d for d, _ in want], q
