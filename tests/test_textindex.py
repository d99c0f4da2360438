"""InvertedTextIndex: build-once-search-many lexical retrieval with
partition pruning; the indexed path must be BIT-EQUAL to the streaming
bm25_scores path (same tokenization, same idf/contribution formulae)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gojsonschema_ray.stages.textindex import InvertedTextIndex


def _corpus() -> pd.DataFrame:
    rng = np.random.default_rng(37)
    vocab = ["filter", "merge", "scan", "sort", "join", "index", "the",
             "a", "of", "data", "query", "plan"]
    rows = []
    for i in range(400):
        n = int(rng.integers(3, 40))
        rows.append(" ".join(rng.choice(vocab, n)))
    rows[17] = ""          # empty doc: excluded from N / avgdl
    rows[23] = None        # null doc
    rows[31] = "Filter MERGE filter"   # case folding
    return pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                         "text": rows})


def test_build_search_parity_with_streaming_bm25(ray_session, tmp_path):
    from gojsonschema_ray.functions.text import bm25_scores
    from gojsonschema_ray.util import collect_table

    df = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    idx = InvertedTextIndex("text", "doc_id", mods=8)
    d = str(tmp_path / "tix")
    idx.build(ds, d)

    q = ["filter", "merge", "scan"]
    got = collect_table(idx.search_pairs(q, d)).to_pandas() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    want = collect_table(
        bm25_scores(ds, "text", "doc_id", q, return_pairs=True)) \
        .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    cols = ["doc_id", "term", "tf", "dl", "contribution"]
    pd.testing.assert_frame_equal(got[cols], want[cols],
                                  check_exact=True)  # BIT-equal

    # top-k agrees with the streaming merge
    from gojsonschema_ray.functions.text import bm25_top_docs

    top = idx.search(q, d, k=5)
    ref = bm25_top_docs(ds, "text", "doc_id", q, k=5)
    assert top["doc_id"].tolist() == ref["doc_id"].tolist()
    # cross-term SUM addend order is engine-defined (the reason the pair
    # form is the hash contract) — scores agree to the last few ulps
    assert np.allclose(top["score"], ref["score"], rtol=1e-12, atol=0)


def test_partition_pruning_and_modes(ray_session, tmp_path):
    import os

    df = _corpus()
    ds = rd.from_pandas(df).repartition(2)
    idx = InvertedTextIndex("text", "doc_id", mods=8)
    d = str(tmp_path / "tix")
    idx.build(ds, d)
    # all 8 tmod dirs exist for this vocab spread; a 1-term probe opens 1
    dirs = sorted(p for p in os.listdir(f"{d}/post") if p.startswith("tmod="))
    assert len(dirs) > 1
    idx.search_pairs(["filter"], d)
    assert idx.last_probe_post_dirs == 1
    # AND mode: every returned doc contains every query term
    q = ["filter", "merge"]
    both = idx.search(q, d, k=1000, mode="and")
    toks = df["text"].str.lower().str.split()
    for did in both["doc_id"]:
        tk = set(toks.iloc[int(did)])
        assert {"filter", "merge"} <= tk
    # OR mode is a superset
    any_ = idx.search(q, d, k=1000, mode="or")
    assert set(both["doc_id"]) <= set(any_["doc_id"])
    assert len(any_) > len(both)
    # unknown term: zero rows, not an error
    none = idx.search(["zzz_not_in_corpus"], d, k=5)
    assert len(none) == 0
    with pytest.raises(ValueError, match="mode"):
        idx.search(["filter"], d, mode="xor")
    with pytest.raises(ValueError, match="empty"):
        idx.search_pairs([], d)


def test_guards():
    with pytest.raises(ValueError, match="reserved"):
        InvertedTextIndex("text", "term")
    with pytest.raises(ValueError, match="power of two"):
        InvertedTextIndex("text", "doc_id", mods=6)
