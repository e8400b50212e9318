"""Differential guards for the round-5 fetch-hot-path rewrites.

Each optimized function is pinned against its original (reference-shaped)
formulation on randomized adversarial inputs, so a later "optimization" that
drifts semantics fails here rather than in a driver hash mismatch:

- ``hashing.squash_ws``       — str.split() join  ≡ ``[\\s　]+`` sub
- ``hashing.simhash64``       — Counter+unpackbits ≡ dict-loop + shift matrix
- ``texttools.p_texts``       — conditional subs   ≡ unconditional sub chain
- ``texttools.html_to_lines`` — squash-if-dirty    ≡ unconditional squash
- ``texttools.main_content``  — split()-sum p_len  ≡ squash-sub len
- ``urltools.canonicalize``   — identity fast path ≡ full parse/rebuild
- ``urltools.resolve``        — colon fast path + base memo ≡ original
"""

from __future__ import annotations

import html as _h
import random
import re

import numpy as np

from lightcrawler_ray.functions import hashing, texttools as tt
from lightcrawler_ray.functions import urltools as ut

_WS_OLD = re.compile(r"[ \t　]+")
_SQ = re.compile(r"[\s　]+")

_POOL = "a b\tc　 d\n中 文\r  e  \x0b\x1c&amp;&lt;<b>x</b><p></p><P></P>《法》。，123_ -"


def _rand_texts(n, maxlen, seed):
    rng = random.Random(seed)
    out = ["", " ", "　\t ", "hello  world", "中文 123 x", "\x85\xa0 "]
    for _ in range(n):
        out.append("".join(rng.choice(_POOL) for _ in range(rng.randrange(0, maxlen))))
    return out


def _old_simhash(text):
    toks = hashing._TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    counts: dict = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    hs = np.fromiter(map(hashing._tok_hash, counts.keys()), dtype=np.uint64,
                     count=len(counts))
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = (bits * w[:, None]).sum(axis=0) * 2 - w.sum()
    sig = (votes > 0).astype(np.uint64)
    return int((sig << np.arange(64, dtype=np.uint64)).sum())


def _old_p_texts(html):
    html = tt._SCRIPT_STYLE_RE.sub(" ", html)
    out = []
    for m in tt._P_RE.finditer(html):
        t = tt._WS_LINE_RE.sub(" ", _h.unescape(tt._TAG_RE.sub("", m.group(1)))).strip()
        if t:
            out.append(t)
    return out


def _old_html_to_lines(html):
    html = tt._SCRIPT_STYLE_RE.sub(" ", html)
    html = tt._TD_RE.sub("|", html)
    html = tt._BLOCK_TAGS_RE.sub("\n", html)
    text = tt._TAG_RE.sub("", html)
    text = _h.unescape(text)
    text = _WS_OLD.sub(" ", text.replace("\r", "\n"))
    return [ln.strip() for ln in text.split("\n") if ln.strip()]


def test_squash_ws_and_simhash_match_reference_formulation():
    for s in _rand_texts(3000, 100, 7):
        assert hashing.squash_ws(s) == _SQ.sub("", s)
        assert hashing.simhash64(s) == _old_simhash(s)


def test_p_texts_and_html_to_lines_match_reference_formulation():
    for s in _rand_texts(2500, 160, 11):
        assert tt.p_texts(s) == _old_p_texts(s)
        assert tt.html_to_lines(s) == _old_html_to_lines(s)


def test_main_content_p_len_counts_nonspace_chars_exactly():
    # the split()-sum inside main_content must equal the squashed length for
    # every whitespace class re's \s accepts (incl. U+2028/U+0085/NBSP)
    for s in _rand_texts(3000, 80, 13):
        assert sum(len(p) for p in s.split()) == len(_SQ.sub("", s))


def _old_quality(text):
    if not text:
        return 0.0
    n = len(text)
    len_score = min(n / 500.0, 1.0) * (1.0 if n < 50_000 else 0.5)
    punct_ratio = len(tt._PUNCT_RE.findall(text[:5000])) / min(n, 5000)
    punct_score = 1.0 - min(punct_ratio * 3.0, 1.0)
    words = [w.lower() for w in re.findall(r"[a-zA-Z]+", text[:5000])]
    if words:
        stop_ratio = sum(w in tt._STOPWORDS_EN for w in words) / len(words)
        stop_score = min(stop_ratio * 4.0, 1.0)
    else:
        stop_score = 0.5
    return round((len_score + punct_score + stop_score) / 3.0, 6)


def test_quality_score_matches_reference_formulation():
    rng = random.Random(29)
    pool = "the and of a 中文。，！？x y_9 \t　«»éπ😀 \x00\ud800"
    cases = ["", "the quick fox", "中文内容。测试！", "😀😀 astral only", "a" * 60000]
    cases += ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 120)))
              for _ in range(4000)]
    for c in cases:
        assert _old_quality(c) == tt.quality_score(c), repr(c[:60])


def _old_canonicalize(url):
    url = ut._WS_RE.sub("", url).strip()
    p = ut.split_url(url)
    if p is None or p["protocol"] not in ("http", "https"):
        return None
    scheme, host = p["protocol"], p["host"]
    if not host:
        return None
    port = p["port"]
    netloc = host if port == ut._DEFAULT_PORT[scheme] else f"{host}:{port}"
    if p["auth"]:
        netloc = f'{p["auth"]}@{netloc}'
    path = ut._norm_pct(ut.remove_dot_segments(str(p["path"]) + str(p["file"])))
    query = str(p["query"])
    if query:
        params = [tuple(kv.split("=", 1)) if "=" in kv else (kv, None)
                  for kv in query.split("&") if kv]
        params.sort(key=lambda kv: (kv[0], kv[1] if kv[1] is not None else ""))
        query = "&".join(
            k if v is None else f"{k}={v}"
            for k, v in ((ut._norm_pct(k), None if v is None else ut._norm_pct(v))
                         for k, v in params))
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    elif path == "/":
        out = out[:-1]
    return out


_DROP = ("javascript:", "mailto:", "tel:", "data:", "ftp:", "file:", "about:")


def _old_resolve(base, link):
    if link is None:
        return None
    link = _h.unescape(link)
    link = ut._WS_RE.sub("", link).strip()
    if not link:
        return None
    low = link.lower()
    for s in _DROP:
        if low.startswith(s):
            return None
    link = link.split("#", 1)[0]
    if not link:
        return None
    if ut._SCHEME_RE.match(link):
        return _old_canonicalize(link)
    bp = ut.split_url(base)
    if bp is None:
        return None
    scheme, port = bp["protocol"], bp["port"]
    netloc = bp["host"] if port == ut._DEFAULT_PORT.get(scheme) else f'{bp["host"]}:{port}'
    if link.startswith("//"):
        return _old_canonicalize(f"{scheme}:{link}")
    if link.startswith("/"):
        return _old_canonicalize(f"{scheme}://{netloc}{link}")
    if link.startswith("?"):
        return _old_canonicalize(f'{scheme}://{netloc}{bp["path"]}{bp["file"]}{link}')
    return _old_canonicalize(f'{scheme}://{netloc}{bp["path"]}{link}')


def test_canonicalize_and_resolve_match_reference_formulation():
    rng = random.Random(19)
    hosts = ["h024.example.test", "H003.EXAMPLE.TEST:80", "my_host", "a.b",
             "127.0.0.1:8080", "host-", "host..", "u:p@h.i"]
    paths = ["", "/", "/p/1988.html", "/a//b", "/a/../b", "/./x", "/a/.",
             "/%41bc", "/a?b=2&a=1", "/a#frag", "/中文/页.html", "/a/...",
             "/.x/y", "/a b", "/a\tb", "/UPPER/Case.HTML", "/..", "/a/", "//",
             "/a&amp;b", "/π%zz"]
    schemes = ["http://", "https://", "HTTP://", "ftp://",
               "javascript:alert(1)", "mailto:x@y", "JavaScript:void(0)", ""]
    cases = [rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
             for _ in range(4000)]
    cases += ["http://h.i/p/1.html", "//h.i/p/2.html", "921.html", "?page=2",
              "/abs/p.html", "#top", "", " http://x.y/a ", "http://host/",
              "http://host", "https://host", "data:text/plain,hi", "a:b.html"]
    bases = ["http://h003.example.test/list/index.html",
             "https://a.b:444/d/f.html?q=1", "http://127.0.0.1/x/",
             "not-a-url", "http://host"]
    for u in cases:
        assert _old_canonicalize(u) == ut.canonicalize(u), u
    for b in bases:
        for u in cases[::7]:
            assert _old_resolve(b, u) == ut.resolve(b, u), (b, u)
