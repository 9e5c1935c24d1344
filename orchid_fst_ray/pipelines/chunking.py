"""Context-window chunking — split documents into fixed-token-count
overlapping windows, the preprocessing step LLM embedding / RAG /
pretraining pipelines run over every corpus.

Fully vectorized over the batch: tokenization reuses the textstats
exploder (Arrow ``split_pattern_regex``); the per-chunk token gather
is one ``np.repeat``-built index array into the flat token column; the
chunk text is rebuilt with a single ``pc.binary_join`` over a
LargeListArray — no Python loop anywhere.

Scale: stateless ``map_batches`` (no shuffle, no driver state) right
after a column-pruned read; output size is input × (1 + overlap
fraction). Deterministic, so a resumed run re-emits identical chunks.

Reference scope note: the reference engine (apollo008/orchid-fst) has
no chunking surface; engine-side addition for the training-data tier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from orchid_fst_ray.pipelines.textstats import _explode_tokens

__all__ = ["doc_chunks", "pack_sequences"]


def doc_chunks(ds, chunk_tokens: int = 64, stride: int = 48,
               text_col: str = "text", id_col: str = "doc_id"):
    """Window each document's token stream into chunks of
    ``chunk_tokens`` tokens advancing by ``stride`` (overlap =
    ``chunk_tokens - stride``). The last window is truncated at the
    document end; documents with zero tokens emit no chunks. Output:
    ``(doc_id, chunk_idx, n_tokens, chunk_text)`` with ``chunk_text``
    the space-joined lowercase ``[a-z0-9]+`` tokens of the window."""
    if not 0 < stride <= chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, row, n = _explode_tokens(t[text_col])
        cnt = (np.bincount(row, minlength=n).astype(np.int64)
               if len(row) else np.zeros(n, np.int64))
        # windows per doc: 1 + ceil((n_tok - chunk)/stride) when the
        # doc overflows one window, else 1; 0 for token-less docs
        extra = np.where(
            cnt > chunk_tokens,
            -(-(cnt - chunk_tokens) // stride),   # ceil-div
            0)
        nch = np.where(cnt > 0, extra + 1, 0)
        total = int(nch.sum())
        if total == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.large_string()),
            })
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), nch)
        firsts = np.concatenate(([0], np.cumsum(nch)[:-1]))
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            firsts, nch)
        start = chunk_idx * stride
        end = np.minimum(start + chunk_tokens, cnt[doc_rep])
        ntok = end - start
        # gather: for every chunk, row_start[doc] + start .. end
        row_start = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        m = int(ntok.sum())
        goffs = np.concatenate(([0], np.cumsum(ntok)[:-1]))
        gidx = (np.repeat(row_start[doc_rep] + start - goffs, ntok)
                + np.arange(m, dtype=np.int64))
        toks = flat.take(pa.array(gidx, pa.int64()))
        la = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(ntok))), pa.int64()),
            toks)
        return pa.table({
            "doc_id": pa.array(ids[doc_rep], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(ntok, pa.int64()),
            "chunk_text": pc.binary_join(
                la, pa.scalar(" ", pa.large_string())),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(ds, seq_tokens: int = 256,
                   text_col: str = "text", id_col: str = "doc_id"):
    """GPT-style sequence packing (concat-and-chunk): documents are
    concatenated in ``id_col`` order into one global token stream and
    cut into fixed ``seq_tokens`` training sequences; each document is
    mapped to its global token offset and the sequence range it lands
    in. Output: ``(doc_id, n_tokens, tok_start, seq_first, seq_last)``
    with ``seq_* = -1`` for token-less documents.

    Distributed as a **two-pass prefix scan** — the global cumulative
    sum never materializes row-level data on the driver:

    1. sort by ``id_col`` (blocks then hold disjoint key ranges) and
       materialize, so both passes see identical blocks;
    2. pass 1: one tiny row per BLOCK ``(first doc_id, token sum)``
       → driver cumsum over O(blocks) rows → broadcast the per-block
       offset table via ``ray.put``;
    3. pass 2: each block recomputes its in-block exclusive cumsum and
       adds the offset matched by its first doc_id.

    ``batch_size=None`` keeps batch == block in both passes (Ray's
    sort never splits one block across batches here)."""
    import ray

    sorted_ds = ds.sort(id_col).materialize()

    def block_sum(t: pa.Table) -> pa.Table:
        _flat, row, n = _explode_tokens(t[text_col])
        if n == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64())})
        first = t[id_col].combine_chunks()[0].as_py()
        return pa.table({"first_id": pa.array([first], pa.int64()),
                         "n_tok": pa.array([int(len(row))], pa.int64())})

    per_block = sorted_ds.map_batches(
        block_sum, batch_size=None, batch_format="pyarrow").take_all()
    per_block.sort(key=lambda r: r["first_id"])
    firsts = np.array([r["first_id"] for r in per_block], np.int64)
    sums = np.array([r["n_tok"] for r in per_block], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    ref = ray.put((firsts, offsets))

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "tok_start": pa.array([], pa.int64()),
                "seq_first": pa.array([], pa.int64()),
                "seq_last": pa.array([], pa.int64())})
        fs, offs = ray.get(ref)
        base = int(offs[np.searchsorted(fs, ids[0])])
        _flat, row, _n = _explode_tokens(t[text_col])
        cnt = (np.bincount(row, minlength=n).astype(np.int64)
               if len(row) else np.zeros(n, np.int64))
        start = base + np.concatenate(([0], np.cumsum(cnt)[:-1]))
        seq_first = np.where(cnt > 0, start // seq_tokens, -1)
        seq_last = np.where(cnt > 0, (start + cnt - 1) // seq_tokens, -1)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(cnt, pa.int64()),
            "tok_start": pa.array(start, pa.int64()),
            "seq_first": pa.array(seq_first, pa.int64()),
            "seq_last": pa.array(seq_last, pa.int64()),
        })

    return sorted_ds.map_batches(assign, batch_size=None,
                                 batch_format="pyarrow")
