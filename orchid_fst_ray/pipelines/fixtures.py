"""Deterministic Common-Crawl-style pages fixture (FIXTURES.md F1/F2).

Synthesizes, from a fixed seed and no external data, a pages table with
the BASELINE.json ``input_hint`` schema::

    url: string, warc_ts: timestamp('ms', UTC), html: binary,
    text: large_string, lang: string

plus the hidden ground truth (url → entity_id) and the labeled-pairs
evaluation table (FIXTURES.md F2). Structure:

- ~``n_pages / 4`` latent entities; each yields 1–8 page variants.
- hosts drawn from a zipf-skewed pool (host index 0 is hot — the
  salting/skew exercise).
- variants differ by url noise (scheme/www/query/trailing slash —
  collapsed by normalization) and/or by ≤2 character edits in the
  title region (caught by the d=2 fuzzy automaton) and body jitter.
- a fraction of entities is Chinese (lang="zh", CJK titles) to
  exercise whole-character UTF-8 semantics.
- the ``text`` column is constructed first and the HTML is built
  around it such that EXTRACTOR SPEC v1 provably inverts it; the
  generator asserts byte equality for every row.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from orchid_fst_ray.stages.extract import extract_text

__all__ = ["make_pages", "pages_dataset"]

_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def _word(rnd: random.Random) -> str:
    n = rnd.randrange(2, 5)
    return "".join(rnd.choice(_CONS) + rnd.choice(_VOW) for _ in range(n))


_CJK_POOL = [chr(c) for c in range(0x4E00, 0x4E00 + 512)]


def _cjk_word(rnd: random.Random) -> str:
    return "".join(rnd.choice(_CJK_POOL) for _ in range(rnd.randrange(2, 5)))


def _edit_title(rnd: random.Random, title: str, n_ops: int) -> str:
    """Apply up to n_ops character edits (sub/del/ins/transpose), never
    touching the first 2 chars so blocking prefixes survive."""
    s = list(title)
    for _ in range(n_ops):
        if len(s) < 4:
            break
        i = rnd.randrange(2, len(s))
        op = rnd.randrange(4)
        if op == 0:
            s[i] = rnd.choice(_CONS + _VOW)
        elif op == 1:
            del s[i]
        elif op == 2:
            s.insert(i, rnd.choice(_CONS + _VOW))
        elif op == 3 and i + 1 < len(s):
            s[i], s[i + 1] = s[i + 1], s[i]
    # collapse whitespace: stacked deletions can annihilate a short
    # word, and a double space would break the extractor's
    # whitespace-normalized output invariant (rare — shows up ~1 in
    # 50k pages); the variant then sits at edit distance 3, a
    # legitimate hard case for the scorer
    return " ".join("".join(s).split())


_BOILER = (
    "<head><title>{t} - SiteIndex</title>"
    "<script>var a=1;function f(){{return 'NOT {t} VISIBLE';}}</script>"
    "<style>.x{{color:red}}</style></head>"
    "<nav><a href='/'>Home</a> &amp; <a href='/about'>About</a></nav>"
    "<header><h6>site header boilerplate</h6></header>"
)
_FOOT = "<footer>© example &copy; footer</footer><aside>ads here</aside>"


def _make_html(rnd: random.Random, title: str, body: str) -> str:
    mid = len(body) // 2
    cut = body.rfind(" ", 0, mid)
    if cut <= 0:
        paras = f"<p>{body}</p>"
    else:
        paras = f"<p>{body[:cut]}</p>\n<p>{body[cut + 1:]}</p>"
    h1 = f"<h1>{title}</h1>"
    return (f"<html>{_BOILER.format(t=title)}<body>{h1}\n{paras}\n"
            f"{_FOOT}</body></html>")


def make_pages(n_pages: int = 2000, seed: int = 42,
               n_hosts: int | None = None,
               zh_fraction: float = 0.06) -> dict[str, pa.Table]:
    """Returns {"pages": Table, "truth": Table, "labeled_pairs": Table}."""
    rnd = random.Random(seed)
    if n_hosts is None:
        n_hosts = max(4, n_pages // 40)
    hosts = [f"site{h}.example{'org' if h % 3 else 'com'}"
             for h in range(n_hosts)]
    # zipf-ish host weights; host 0 hot
    w = np.array([1.0 / (1 + i) ** 0.8 for i in range(n_hosts)])
    w /= w.sum()

    n_entities = max(1, n_pages // 4)
    rows: list[tuple] = []          # url, ts, html, text, lang, entity
    used_urls: set[str] = set()
    ts0 = 1_577_836_800_000        # 2020-01-01 in ms
    eid = 0
    while len(rows) < n_pages:
        eid += 1
        is_zh = rnd.random() < zh_fraction
        host = hosts[int(rnd.choices(range(n_hosts), weights=w)[0])]
        if is_zh:
            title_words = [_cjk_word(rnd) for _ in range(rnd.randrange(2, 4))]
            body_words = [_cjk_word(rnd) for _ in range(rnd.randrange(15, 40))]
            lang = "zh"
        else:
            title_words = [_word(rnd) for _ in range(rnd.randrange(4, 8))]
            body_words = [_word(rnd) for _ in range(rnd.randrange(20, 80))]
            lang = "en"
        title = " ".join(title_words)
        path = "/" + "-".join(title_words[:2]) + f"/{eid}"
        n_var = rnd.choices([1, 2, 3, 4, 5, 8],
                            weights=[30, 25, 20, 12, 8, 5])[0]
        for v in range(n_var):
            if len(rows) >= n_pages:
                break
            # url variant
            scheme = rnd.choice(["http://", "https://"])
            www = rnd.choice(["", "www."])
            vpath = path
            if v > 0 and rnd.random() < 0.5:
                vpath = path + rnd.choice(["/print", "/amp", "-v2"])
            q = rnd.choice(["", "?utm_source=feed", "?ref=rss"]) if v else ""
            url = f"{scheme}{www}{host}{vpath}{q}"
            if url in used_urls:
                url = f"{scheme}{www}{host}{vpath}/{v}{q}"
            if url in used_urls:
                continue
            used_urls.add(url)
            # text variant: v==0 canonical; else maybe edited title + body jitter
            vtitle = title if v == 0 else _edit_title(
                rnd, title, rnd.choices([0, 1, 2], weights=[40, 40, 20])[0])
            vbody = list(body_words)
            if v > 0 and rnd.random() < 0.6:
                # drop/append a few body words (doesn't touch the doc_key)
                for _ in range(rnd.randrange(0, 4)):
                    if len(vbody) > 10:
                        vbody.pop(rnd.randrange(len(vbody)))
                vbody += [_word(rnd) for _ in range(rnd.randrange(0, 3))]
            text = vtitle + " " + " ".join(vbody)
            html = _make_html(rnd, vtitle, " ".join(vbody))
            got = extract_text(html)
            if got != text:  # self-validating byte-identity invariant
                raise AssertionError(
                    f"fixture violates extractor invariant: {got!r} != {text!r}")
            ts = ts0 + len(rows) * 60_000 + rnd.randrange(0, 50_000)
            rows.append((url, ts, html.encode("utf-8"), text, lang, eid))

    pages = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows],
                            pa.timestamp("ms", tz="UTC")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": pa.array([r[3] for r in rows], pa.large_string()),
        "lang": pa.array([r[4] for r in rows], pa.string()),
    })
    truth = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "entity_id": pa.array([r[5] for r in rows], pa.int64()),
        "host": pa.array([r[0].split("://")[-1].removeprefix("www.")
                          .split("/")[0].lower() for r in rows],
                         pa.string()),
    })
    labeled = _labeled_pairs(rows, rnd)
    return {"pages": pages, "truth": truth, "labeled_pairs": labeled}


def _labeled_pairs(rows, rnd: random.Random) -> pa.Table:
    """FIXTURES.md F2: positives = all within-entity pairs (same host
    block by construction); negatives = sampled same-host cross-entity
    pairs (hard negatives), ~2x positives."""
    by_entity: dict[int, list[str]] = {}
    by_host: dict[str, list[tuple[str, int]]] = {}
    for url, _ts, _h, _t, _lang, eid in rows:
        host = url.split("://")[-1].removeprefix("www.").split("/")[0].lower()
        by_entity.setdefault(eid, []).append(url)
        by_host.setdefault(host, []).append((url, eid))
    pos: list[tuple[str, str, str]] = []
    for eid, urls in by_entity.items():
        host = urls[0].split("://")[-1].removeprefix("www.").split("/")[0].lower()
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                a, b = sorted((urls[i], urls[j]))
                pos.append((a, b, host))
    neg: list[tuple[str, str, str]] = []
    target = 2 * len(pos)
    hosts_list = [h for h, lst in by_host.items() if len(lst) > 1]
    guard = 0
    while len(neg) < target and hosts_list and guard < 50 * target:
        guard += 1
        h = rnd.choice(hosts_list)
        (ua, ea), (ub, eb) = rnd.sample(by_host[h], 2)
        if ea == eb:
            continue
        a, b = sorted((ua, ub))
        neg.append((a, b, h))
    neg = list(dict.fromkeys(neg))
    return pa.table({
        "url_a": pa.array([p[0] for p in pos] + [n[0] for n in neg]),
        "url_b": pa.array([p[1] for p in pos] + [n[1] for n in neg]),
        "is_match": pa.array([True] * len(pos) + [False] * len(neg)),
        "block_key": pa.array([p[2] for p in pos] + [n[2] for n in neg]),
    })


def pages_dataset(n_pages: int = 2000, seed: int = 42,
                  parallelism: int = 8):
    """The pages fixture as a Ray Dataset (blocks pre-split)."""
    import ray.data as rd
    t = make_pages(n_pages, seed)["pages"]
    return rd.from_arrow(t).repartition(parallelism)
