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

import random

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


_EDIT_CHARS = "abcdefghijklmnopqrstuvwz"


def _variant_urls(base: str, v: int) -> str:
    """Deterministic crawl-style url noise collapsed by normalization
    (or not — path variants stay distinct resources on the same host)."""
    forms = [
        base,
        "http://" + base.removeprefix("https://"),
        base.replace("://", "://www.", 1) + "?utm_source=feed",
        base + "/amp",
        base + "/print?ref=rss",
    ]
    return forms[v % len(forms)]


def _edit_title_tokens(toks: list[str], rnd: random.Random,
                       n_ops: int) -> list[str]:
    """≤ n_ops character edits over the title token span, never in the
    first 2 chars (the blocking prefix survives, like the fixture)."""
    s = list(" ".join(toks))
    for _ in range(n_ops):
        if len(s) < 4:
            break
        i = rnd.randrange(2, len(s))
        op = rnd.randrange(3)
        if op == 0 and s[i] != " ":
            s[i] = rnd.choice(_EDIT_CHARS)
        elif op == 1 and s[i] != " ":
            del s[i]
        else:
            s.insert(i, rnd.choice(_EDIT_CHARS))
    return "".join(s).split()


def pages_from_documents(sf_dir: str, parallelism: int = 0,
                         variants: int = 1):
    """read_parquet(documents) → pages Dataset with the input_hint
    schema; extraction invariant asserted per row.

    ``variants > 1`` emits up to that many near-duplicate pages per
    document (url noise + ≤2 deterministic title edits — within the
    d=2 fuzzy blocking budget), turning the table into a realistic ER
    workload whose ground-truth entity is the ``doc_id`` embedded in
    the url path.
    """
    import ray.data as rd

    def to_pages(t: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for did, txt, src, lang in zip(
                t["doc_id"].to_pylist(), t["text"].to_pylist(),
                t["source"].to_pylist(), t["lang"].to_pylist()):
            norm = " ".join((txt or "").split())
            n_var = 1 if variants <= 1 else (int(did) % variants) + 1
            for v in range(n_var):
                if v == 0:
                    page_text = norm
                else:
                    rnd = random.Random(int(did) * 1_000_003 + v)
                    toks = norm.split()
                    head = _edit_title_tokens(
                        toks[:8], rnd, rnd.choice([0, 1, 2]))
                    page_text = " ".join(head + toks[8:])
                url, ts, html, _, _ = _doc_to_page(
                    did, page_text, src, lang)
                url = _variant_urls(url, v)
                got = extract_text(html)
                if got != page_text:  # frozen invariant — never drift
                    raise AssertionError(
                        f"extractor invariant broken for doc {did}")
                urls.append(url)
                tss.append(ts + v)
                htmls.append(html)
                texts.append(page_text)
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
