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
