"""Context-window chunking tests (`pipelines/chunking.py`): window
math against a brute-force reference, overlap reconstruction, edge
sizes, and determinism."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from orchid_fst_ray.pipelines.chunking import doc_chunks

SF = "/root/testdata/sf0.001"


def _brute(texts, ids, chunk=64, stride=48):
    rows = []
    for i, txt in zip(ids, texts):
        toks = re.findall(r"[a-z0-9]+", txt.lower())
        if not toks:
            continue
        k = 0
        while True:
            start = k * stride
            win = toks[start:start + chunk]
            rows.append((i, k, len(win), " ".join(win)))
            if start + chunk >= len(toks):
                break
            k += 1
    return rows


def test_chunks_match_brute_force(ray_session):
    texts = [
        "one two three",                                   # < chunk
        " ".join(f"w{i}" for i in range(64)),              # == chunk
        " ".join(f"w{i}" for i in range(65)),              # chunk + 1
        " ".join(f"w{i}" for i in range(200)),             # many windows
        "",                                                # no tokens
        "...!!!",                                          # no tokens
        " ".join(f"w{i}" for i in range(112)),             # 64 + 48 exact
    ]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": texts}))
    got = doc_chunks(ds).sort(["doc_id", "chunk_idx"]).to_pandas()
    want = _brute(texts, ids)
    assert len(got) == len(want)
    for row, (i, k, n, txt) in zip(got.itertuples(index=False), want):
        assert (row.doc_id, row.chunk_idx, row.n_tokens,
                row.chunk_text) == (i, k, n, txt)


def test_chunks_cover_and_overlap(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    out = doc_chunks(docs, chunk_tokens=32,
                     stride=24).sort(["doc_id", "chunk_idx"]).to_pandas()
    full = docs.to_pandas()
    # stitching chunks back with the overlap dropped reconstructs the
    # full token stream of every document
    by_doc = dict(zip(full["doc_id"], full["text"]))
    for doc_id, grp in out.groupby("doc_id"):
        toks = []
        for _, r in grp.sort_values("chunk_idx").iterrows():
            win = r["chunk_text"].split(" ")
            toks.extend(win if r["chunk_idx"] == 0 else win[32 - 24:])
        ref = re.findall(r"[a-z0-9]+", by_doc[doc_id].lower())
        assert toks == ref
    # every middle window is exactly chunk_tokens long
    mid = out.groupby("doc_id")["chunk_idx"].transform("max")
    assert (out.loc[out["chunk_idx"] < mid, "n_tokens"] == 32).all()


def test_chunks_deterministic(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = doc_chunks(docs).sort(["doc_id", "chunk_idx"]).to_pandas()
    b = doc_chunks(rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ).sort(["doc_id", "chunk_idx"]).to_pandas()
    assert np.array_equal(a["chunk_text"].to_numpy(),
                          b["chunk_text"].to_numpy())


def test_pack_sequences_matches_brute(ray_session):
    from orchid_fst_ray.pipelines.chunking import pack_sequences
    texts = ["", "one two three", "...", " ".join(
        f"w{i}" for i in range(300))] + [
        " ".join(f"t{j}" for j in range(i % 37)) for i in range(60)]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(7)
    out = pack_sequences(ds, seq_tokens=64).sort("doc_id").to_pandas()
    # brute: global cumsum in doc_id order
    counts = [len(re.findall(r"[a-z0-9]+", t.lower())) for t in texts]
    start = np.concatenate(([0], np.cumsum(counts)[:-1]))
    assert (out["n_tokens"].to_numpy() == counts).all()
    assert (out["tok_start"].to_numpy() == start).all()
    pos = (out["n_tokens"] > 0).to_numpy()
    assert (out["seq_first"].to_numpy()[pos]
            == start[pos] // 64).all()
    assert (out["seq_last"].to_numpy()[pos]
            == (start[pos] + np.array(counts)[pos] - 1) // 64).all()
    assert (out["seq_first"].to_numpy()[~pos] == -1).all()


def test_pack_sequences_partition_invariant(ray_session):
    from orchid_fst_ray.pipelines.chunking import pack_sequences
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = pack_sequences(docs, seq_tokens=128).sort("doc_id").to_pandas()
    b = pack_sequences(
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).repartition(13),
        seq_tokens=128).sort("doc_id").to_pandas()
    # the global scan must not depend on the block layout
    for c in a.columns:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c
