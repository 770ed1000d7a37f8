"""End-to-end curation pipeline: sink layout, resume, filter/dedup glue.

Value-level correctness of the full chain is hash-checked by the
`curate_corpus` contract entry vs a composed DuckDB oracle
(scripts/check_contract.py); these tests pin the sink semantics the
oracle can't see: the hive layout, the manifest, atomic swap, and the
resume short-circuit.
"""

import json
import os

import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.curate import MANIFEST_NAME, curate_corpus, read_curated

# a diverse vocabulary (1000 letter-only words): random 40-word draws
# are far apart in SimHash space, so near-dedup only merges real dups
# (letter-only also keeps digit_ratio at 0 for the quality filter)
_VOCAB = [a + b + c for a in "abcdefghij" for b in "klmnopqrst" for c in "uvwxyzabcd"]


def _text(seed: int, n: int = 40) -> str:
    import random

    rng = random.Random(seed)
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _mini_docs() -> pa.Table:
    doc_ids, texts, langs = [], [], []

    def add(i, t, lang):
        doc_ids.append(i)
        texts.append(t)
        langs.append(lang)

    for i in range(20):
        add(i, _text(i), ("en", "de", "es")[i % 3])
    add(100, texts[0], "en")          # exact dup of doc 0 -> dropped
    add(101, "short text", "en")      # low quality (2 tokens) -> dropped
    add(102, " ".join("1234" for _ in range(50)), "en")  # digit noise -> dropped
    add(103, _text(3), "ja")          # lang outside the allow-list -> dropped
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def test_curate_layout_resume_and_filters(tmp_path, ray_session):
    out = str(tmp_path / "curated")
    docs = rd.from_arrow(_mini_docs())
    m1 = curate_corpus(
        docs, out, min_quality=0.35, langs=["de", "en", "es"], n_shards=4
    )
    assert m1["resumed"] is False
    assert not os.path.exists(out + ".writing")

    # manifest on disk matches the returned one and the actual layout
    with open(os.path.join(out, MANIFEST_NAME)) as f:
        disk = json.load(f)
    assert disk["n_docs_out"] == m1["n_docs_out"]
    for part in disk["partitions"]:
        assert os.path.isdir(os.path.join(out, part)), part
        assert part.startswith("lang=")

    back = read_curated(out).to_pandas()
    assert len(back) == m1["n_docs_out"]
    got = set(back["doc_id"].astype(int))
    # dropped: exact dup (keep-min keeps 0), low-quality, digit-noise,
    # disallowed lang. doc 0 is the global min id, so it is canonical in
    # any cluster it lands in.
    assert 0 in got
    assert len(got) >= 15, got
    assert got.isdisjoint({100, 101, 102, 103})
    # hive partition columns restored and consistent with the data
    assert set(back.columns) >= {"doc_id", "lang", "shard", "text"}
    assert (back["doc_id"].astype(int) % 4 == back["shard"].astype(int)).all()
    assert set(back["lang"].astype(str)) <= {"de", "en", "es"}

    # resume: same config short-circuits without recomputation
    m2 = curate_corpus(
        docs, out, min_quality=0.35, langs=["de", "en", "es"], n_shards=4
    )
    assert m2["resumed"] is True
    assert m2["n_docs_out"] == m1["n_docs_out"]

    # changed config recomputes (stricter quality keeps fewer or equal)
    m3 = curate_corpus(
        docs, out, min_quality=0.9, langs=["de", "en", "es"], n_shards=4
    )
    assert m3["resumed"] is False
    assert m3["n_docs_out"] <= m1["n_docs_out"]
