"""Deterministic HTML→text extraction + url normalization stage.

This is the pipeline's frozen per-row invariant (BASELINE.json
``input_hint``: byte-identical extracted text per url). The extractor
is pure-stdlib (``html.parser``) with pinned, versioned semantics —
no version-floating HTML library behavior (SURVEY.md §7.4):

EXTRACTOR SPEC v1
- parse the document as HTML; ignore everything inside
  ``script, style, noscript, template, head, title, nav, header,
  footer, aside`` elements (nesting-aware).
- collect all remaining character data, entity-decoded.
- tokenize the collected data on ASCII whitespace and join with a
  single space (leading/trailing whitespace dropped).

The stage is a stateless ``map_batches`` transform over zero-copy
Arrow; ``html`` is dropped from the schema immediately after
extraction so downstream shuffles never move the wide binary column
(SURVEY.md §7.4 "wide binary rows").
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

from orchid_fst_ray.functions.text import (
    doc_keys_from_text, normalize_urls, url_hosts,
)

__all__ = ["extract_text", "extract_text_title", "ExtractNormalize",
           "EXTRACTOR_VERSION"]

EXTRACTOR_VERSION = "v1"

_SKIP_TAGS = frozenset({
    "script", "style", "noscript", "template", "head", "title",
    "nav", "header", "footer", "aside",
})
# void elements never push skip depth (they cannot contain text)
_VOID = frozenset({"br", "hr", "img", "meta", "link", "input", "area",
                   "base", "col", "embed", "source", "track", "wbr"})


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._chunks: list[str] = []
        self._h1_depth = 0
        self._h1_chunks: list[str] = []
        self._h1_done = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS and tag not in _VOID:
            self._skip += 1
        elif tag == "h1" and not self._h1_done and self._skip == 0:
            self._h1_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip > 0:
            self._skip -= 1
        elif tag == "h1" and self._h1_depth > 0:
            self._h1_depth -= 1
            if self._h1_depth == 0:
                self._h1_done = True

    def handle_data(self, data):
        if self._skip == 0 and data:
            self._chunks.append(data)
            if self._h1_depth > 0:
                self._h1_chunks.append(data)

    def text(self) -> str:
        return " ".join("".join(self._chunks).split())

    def h1(self) -> str:
        return " ".join("".join(self._h1_chunks).split())


def extract_text(html: bytes | str) -> str:
    """Extract visible text from one HTML document (EXTRACTOR SPEC v1)."""
    return extract_text_title(html)[0]


def extract_text_title(html: bytes | str) -> tuple[str, str]:
    """(visible text, first-h1 title) — title is the fuzzy-blocking key
    source; falls back to "" when the page has no h1."""
    if isinstance(html, (bytes, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return p.text(), p.h1()


class ExtractNormalize:
    """map_batches stage: pages(url, warc_ts, html, lang[, ...]) →
    docs(url, norm_url, host, doc_key, text, lang, warc_ts).

    Callable-class form so it can run in an actor pool when the
    extraction model grows state; today init only pins config.
    """

    def __init__(self, doc_key_tokens: int = 8) -> None:
        self.doc_key_tokens = doc_key_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from orchid_fst_ray.stages.candidates import _clamp_arrow_pool
        # one task, one core (see candidates._clamp_arrow_pool):
        # Arrow's process-global thread pool otherwise fans this
        # 1-CPU task onto every core the worker can see, making
        # low-num_cpus sessions dishonest and thrashing full ones
        _clamp_arrow_pool()
        pairs = [extract_text_title(h) for h in batch["html"].to_pylist()]
        texts = pa.array([p[0] for p in pairs], pa.large_string())
        titles = pa.array([p[1] for p in pairs], pa.large_string())
        urls = batch["url"]
        # blocking key: normalized title when present, else head of text
        key_src = pc.if_else(pc.equal(titles, ""), texts, titles)
        out = pa.table({
            "url": pc_cast_large(urls),
            "norm_url": normalize_urls(urls),
            "host": url_hosts(urls),
            "doc_key": doc_keys_from_text(key_src, self.doc_key_tokens),
            "title": titles,
            "text": texts,
            "lang": pc_cast_large(batch["lang"]),
            "warc_ts": batch["warc_ts"],
        })
        return out  # html intentionally dropped here


def pc_cast_large(arr):
    import pyarrow.compute as pc
    return pc.cast(arr, pa.large_string())
