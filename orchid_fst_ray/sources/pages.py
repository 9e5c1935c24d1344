"""Derive a Common-Crawl-style pages table from the documents table.

The driver's testdata has no pages table, and BASELINE.json forbids
external data — so the canonical ``(url, warc_ts, html, text, lang)``
input (input_hint schema) is synthesized *deterministically* from
``documents.parquet``: each document becomes one page whose HTML wraps
the document text with boilerplate such that EXTRACTOR SPEC v1
(stages/extract.py) provably inverts it; the invariant is asserted per
row at construction. This keeps the byte-identical-extraction gate real
on driver data at every scale factor.
"""

from __future__ import annotations

import pyarrow as pa

from orchid_fst_ray.stages.extract import extract_text

__all__ = ["pages_from_documents"]

_TS0 = 1_577_836_800_000  # 2020-01-01T00:00:00Z in ms

_BOILER = (
    "<head><title>doc</title><script>var x=0;</script>"
    "<style>.b{font-weight:bold}</style></head>"
    "<nav><a href='/'>Home</a></nav>"
)
_FOOT = "<footer>footer</footer>"


def _doc_to_page(doc_id: int, text: str, source: str, lang: str):
    toks = text.split()
    title = " ".join(toks[:8])
    body = " ".join(toks[8:])
    html = (f"<html>{_BOILER}<body><h1>{title}</h1>\n<p>{body}</p>\n"
            f"{_FOOT}</body></html>")
    url = f"https://{source}.example.com/doc/{doc_id}"
    ts = _TS0 + int(doc_id) * 60_000
    return url, ts, html.encode("utf-8"), ts, lang


def pages_from_documents(sf_dir: str, parallelism: int = 0):
    """read_parquet(documents) → pages Dataset with the input_hint
    schema; extraction invariant asserted per row."""
    import ray.data as rd

    def to_pages(t: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for did, txt, src, lang in zip(
                t["doc_id"].to_pylist(), t["text"].to_pylist(),
                t["source"].to_pylist(), t["lang"].to_pylist()):
            norm = " ".join((txt or "").split())
            url, ts, html, _, _ = _doc_to_page(did, norm, src, lang)
            got = extract_text(html)
            if got != norm:  # frozen invariant — fail loudly, never drift
                raise AssertionError(
                    f"extractor invariant broken for doc {did}")
            urls.append(url)
            tss.append(ts)
            htmls.append(html)
            texts.append(norm)
            langs.append(lang)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("ms", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        })

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source", "lang"])
    if parallelism:
        ds = ds.repartition(parallelism)
    return ds.map_batches(to_pages, batch_format="pyarrow")
