"""Source-format parity: the JSONL route produces the exact corpus the
CSV route does over the same rows (shared concat/dedup/id pipeline)."""

import csv
import json

import pytest

from pyfuseray.pipeline import csv_to_corpus, jsonl_to_corpus

ROWS = [
    ("t1", "Quick Fox", "The Zephyrs", "the quick brown foxes jump over lazy dogs"),
    ("t2", "Flower Song", "Spring Band", "flowers bloom in the spring garden"),
    ("t3", "Wizard Waltz", "Quartz", "five boxing wizards jumped quickly"),
    ("t2", "Flower Song DUP", "Spring Band", "this duplicate row must be dropped"),
    ("t4", "Night Run", "Dogs", "running dogs chase playing cats nightly"),
]
COLS = ["track_id", "track_name", "track_artist", "lyrics"]


@pytest.fixture(scope="module")
def both_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    csv_path = str(d / "songs.csv")
    with open(csv_path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(COLS)
        w.writerows(ROWS)
    jsonl_path = str(d / "songs.json")
    with open(jsonl_path, "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(dict(zip(COLS, r))) + "\n")
    return csv_path, jsonl_path


def test_jsonl_route_matches_csv_route(ray_session, both_files):
    csv_path, jsonl_path = both_files
    kw = dict(
        text_columns=["track_name", "track_artist", "lyrics"],
        dedup_column="track_id",
    )
    from_csv = (
        csv_to_corpus(csv_path, **kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    from_jsonl = (
        jsonl_to_corpus(jsonl_path, **kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(from_jsonl) == 4  # keep-first dedup applied
    assert from_csv.equals(from_jsonl)


def test_keep_first_is_file_order_across_files(ray_session, tmp_path_factory):
    """The survivor for a duplicated key is the FILE-ORDER-first row even
    when the duplicate lands in a different file (read task) — i.e. the
    reader-stamped _pos column, not content hashes, decides keep-first."""
    d = tmp_path_factory.mktemp("multi")
    # sorted file order: 00.csv before 01.csv; key t9 appears in both.
    # min-md5(text) would keep "aaaa early alphabet" regardless of file
    # order; file-order keep-first must keep the 00.csv row.
    with open(d / "00.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["track_id", "body"])
        w.writerow(["t9", "zzzz late alphabet but first in file order"])
        w.writerow(["t8", "some other song"])
    with open(d / "01.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["track_id", "body"])
        w.writerow(["t9", "aaaa early alphabet"])
        w.writerow(["t7", "third song"])
    corpus = csv_to_corpus(
        str(d), text_columns=["body"], dedup_column="track_id"
    ).to_pandas()
    assert len(corpus) == 3
    t9 = corpus[corpus.text.str.contains("alphabet")]
    assert len(t9) == 1
    assert "first in file order" in t9.iloc[0].text


def test_jsonl_chunked_pos(ray_session, tmp_path):
    """Chunked JSONL parsing keeps _pos = exact line number across chunk
    boundaries (chunk_rows smaller than the file)."""
    from pyfuseray.pipeline import _read_jsonl_with_pos

    path = str(tmp_path / "r.jsonl")
    with open(path, "w") as fh:
        for i in range(10):
            fh.write(json.dumps({"id": i, "body": f"doc number {i}"}) + "\n")
    df = _read_jsonl_with_pos(path, chunk_rows=3).to_pandas()
    assert sorted(df["_pos"]) == list(range(10))
    by_pos = df.sort_values("_pos").reset_index(drop=True)
    assert list(by_pos["id"]) == list(range(10))
