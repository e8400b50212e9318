"""HTML parsing for the crawl pipeline — link extraction, image harvest,
meta/base handling, pagination synthesis, charset decode.

Semantics re-expressed from the reference (no code ported):

- 3-pass link extraction (M4): well-formed ``<a>…</a>`` capturing anchor text;
  then any link-carrying attribute; then an aggressive unquoted/css-url pass —
  per-document dedup by raw link, in first-seen order
  (vendor/PHPCrawl_083/libs/PHPCrawlerLinkFinder.class.php:140-239,279-308).
- pre-pass section exclusion (M5): blank ``<script>`` blocks, HTML comments
  and inline ``on*=`` JS before the regexes run (:244-269).
- ``<base href>`` overrides the resolution base, ``<meta>`` tags are scraped
  to a dict (M7, PHPCrawlerUtils.class.php:568-585,335-345).
- image harvest (M25): ``<img src alt>`` pairs — the alt text is the graft's
  caption (ExtractContent.class.php:741-788; caption analog per BASELINE.json).
- pagination synthesis (M29): ``var countPage = N`` JS vars → synthesized
  sibling list URLs (worker/SpiderCsrcGov.class.php:117-199).
- charset normalize (M13): sniff ``<meta charset>``, decode GBK/GB2312/GB18030
  to str (libs/CharsetHelper.class.php:19-35).

All regexes compile at import (once per worker process).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from . import urltools as ut

# link-carrying attributes, per the reference's pass-2 list
_LINK_ATTRS = "href|src|url|location|codebase|background|data|profile|action|open"

_A_TAG_RE = re.compile(
    r"<a\s[^>]*?href\s*=\s*([\"'])(.*?)\1[^>]*>(.*?)</a\s*>",
    re.IGNORECASE | re.DOTALL,
)
_ATTR_RE = re.compile(
    rf"<[^>]+?(?:{_LINK_ATTRS})\s*=\s*([\"'])(.*?)\1", re.IGNORECASE | re.DOTALL
)
_AGGRESSIVE_RE = re.compile(
    rf"(?:{_LINK_ATTRS})\s*=\s*([^\s\"'>]+)|url\s*\(\s*([\"']?)([^)\"']+)\2\s*\)",
    re.IGNORECASE,
)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_ONATTR_RE = re.compile(r"\son\w+\s*=\s*([\"']).*?\1", re.IGNORECASE | re.DOTALL)
_BASE_RE = re.compile(r"<base\s[^>]*?href\s*=\s*([\"'])(.*?)\1", re.IGNORECASE)
_META_RE = re.compile(
    r"<meta\s[^>]*?name\s*=\s*([\"'])(.*?)\1[^>]*?content\s*=\s*([\"'])(.*?)\3",
    re.IGNORECASE | re.DOTALL,
)
_IMG_RE = re.compile(r"<img\s[^>]*?src\s*=\s*([\"'])(.*?)\1[^>]*?>", re.IGNORECASE | re.DOTALL)
_ALT_RE = re.compile(r"alt\s*=\s*([\"'])(.*?)\1", re.IGNORECASE | re.DOTALL)
_TAG_STRIP_RE = re.compile(r"<[^>]+>")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=?\s*[\"']?\s*([a-zA-Z0-9_-]+)", re.IGNORECASE
)
_COUNTPAGE_RE = re.compile(r"var\s+countPage\s*=\s*(\d+)", re.IGNORECASE)
# m_nRecordCount appears quoted or bare (SpiderCsrcGov.class.php:146-149)
_RECCOUNT_RE = re.compile(r"var\s+m_nRecordCount\s*=\s*\"?(\d+)\"?\s*;", re.IGNORECASE)
_PAGESIZE_RE = re.compile(r"var\s+m_nPageSize\s*=\s*(\d+)\s*;", re.IGNORECASE)
# the JS pager's file-series shape: location.href = url+"index"+"."+"htm"
# (SpiderCsrcGov.class.php:228-236)
_HREF_SERIES_RE = re.compile(
    r"location\.href\s*=\s*url\s*\+\s*\"([a-z0-9]+)\"\s*\+\s*\"\.\"\s*\+\s*\"([a-z0-9]+)\"",
    re.IGNORECASE,
)
_PAGE_PARAM_RE = re.compile(r"page=\d+")


@dataclass
class FoundLink:
    link_raw: str
    linktext: str
    url: str  # resolved canonical


def decode_body(body: bytes, content_type: str = "") -> str:
    """M13 + M30 — gzip sniff/inflate (magic 1f 8b, the reference's
    decodeGZipContent, PHPCrawlerEncodingUtils.class.php:13-33), then
    charset sniff + decode to str (utf-8 default, GBK family handled)."""
    if bytes(body[:2]) == b"\x1f\x8b":  # bytes(): body may be a memoryview
        import gzip

        try:
            body = gzip.decompress(body)
        except (OSError, EOFError):
            pass  # corrupt/truncated stream: fall through and decode as-is
    m = _CHARSET_RE.search(body[:4096])
    enc = "utf-8"
    if m:
        enc = m.group(1).decode("ascii", "ignore").lower()
    elif "charset=" in content_type:
        enc = content_type.split("charset=")[-1].split(";")[0].strip().lower()
    if enc in ("gb2312", "gbk", "gb18030"):
        enc = "gb18030"
    try:
        return str(body, enc, "replace")  # buffer-protocol decode (bytes or memoryview)
    except LookupError:
        return str(body, "utf-8", "replace")


def exclude_sections(html: str, strip_scripts: bool = True) -> str:
    """M5 — blank scripts/comments/on*= handlers (lengths preserved not needed:
    the reference also just removes them before the link regexes)."""
    if strip_scripts:
        html = _SCRIPT_RE.sub(" ", html)
    html = _COMMENT_RE.sub(" ", html)
    html = _ONATTR_RE.sub(" ", html)
    return html


def find_links(html: str, base_url: str, aggressive: bool = False,
               stripped: str | None = None) -> list[FoundLink]:
    """M4 — 3-pass extraction, first-seen order, per-doc dedup by raw link.

    The resolution base honors a ``<base href>`` tag when present (M7).
    ``stripped``: the caller's pre-computed ``exclude_sections(html)`` —
    the fetch hot path shares one exclusion pass between find_links and
    find_images instead of paying it twice per page."""
    bm = _BASE_RE.search(html)
    base = bm.group(2).strip() if bm else base_url
    if bm and ut.split_url(base) is None:  # relative base href
        base = ut.resolve(base_url, base) or base_url
    if stripped is None:
        stripped = exclude_sections(html)
    seen: set[str] = set()
    out: list[FoundLink] = []

    def add(raw: str, text: str) -> None:
        raw = raw.strip()
        if not raw or raw in seen:
            return
        seen.add(raw)
        url = ut.resolve(base, raw)
        if url:
            out.append(FoundLink(raw, text.strip(), url))

    for m in _A_TAG_RE.finditer(stripped):
        add(m.group(2), _TAG_STRIP_RE.sub("", m.group(3)))
    for m in _ATTR_RE.finditer(stripped):
        add(m.group(2), "")
    if aggressive:
        for m in _AGGRESSIVE_RE.finditer(stripped):
            add(m.group(1) or m.group(3), "")
    return out


def find_images(html: str, base_url: str,
                stripped: str | None = None) -> list[tuple[str, str]]:
    """M25 — (canonical image url, caption) pairs from ``<img src alt>``.

    Runs after section exclusion (M5) like find_links, so ``<img>`` tags
    inside comments or script blocks cannot contribute (or overwrite)
    captions — matching the reference's pre-pass order.  ``stripped``: a
    pre-computed ``exclude_sections(html)`` shared with find_links."""
    html = exclude_sections(html) if stripped is None else stripped
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for m in _IMG_RE.finditer(html):
        src = m.group(2).strip()
        if not src or src in seen:
            continue
        seen.add(src)
        alt = ""
        am = _ALT_RE.search(m.group(0))
        if am:
            alt = am.group(2)
        url = ut.resolve(base_url, src)
        if url:
            out.append((url, alt))
    return out


def find_meta(html: str) -> dict[str, str]:
    """M7 — ``<meta name content>`` → dict (first wins)."""
    out: dict[str, str] = {}
    for m in _META_RE.finditer(html):
        k = m.group(2).strip().lower()
        if k and k not in out:
            out[k] = m.group(4).strip()
    return out


def page_title(html: str) -> str:
    m = _TITLE_RE.search(html)
    return m.group(1).strip() if m else ""


def synthesize_pagination(list_url: str, html: str, max_pages: int = 10) -> list[str]:
    """M29 — synthesize the sibling list-page series from the pager's JS
    variables, capped at ``max_pages`` (the reference caps reseeding at
    MAX_PAGE=10, worker/SpiderGovCnZhengce.class.php:87-96).  Three variants
    (worker/SpiderCsrcGov.class.php:117-258):

    1. ``var m_nRecordCount = "T"; var m_nPageSize = S;`` → pages = T // S
       (computePages1 :144-199); without a page size no series is emitted.
    2. ``var countPage = N`` → pages = N (computePages :117-138).
    3. URL shape: a ``page=K`` query param is substituted per page
       (:213-216); else a ``location.href = url+"name"+"."+"ext"`` pager
       yields the file series ``name.ext, name_1.ext, …`` in the list URL's
       directory (:228-248); else ``?page=i`` is appended (the generic
       ``_handleListPage`` fallback, worker/SpiderFrame.class.php:184-199).
    """
    pages = 0
    m = _RECCOUNT_RE.search(html)
    if m:
        total = int(m.group(1))
        ps = _PAGESIZE_RE.search(html)
        if not ps:
            return []  # reference: "FATAL get pagesize failed" → no series
        pages = total // int(ps.group(1))
    else:
        m = _COUNTPAGE_RE.search(html)
        if not m:
            return []
        pages = int(m.group(1))
    if _PAGE_PARAM_RE.search(list_url):
        n = min(pages, max_pages)
        return [_PAGE_PARAM_RE.sub(f"page={i}", list_url) for i in range(1, n + 1)]
    hs = _HREF_SERIES_RE.search(html)
    if hs:
        name, ext = hs.group(1), hs.group(2)
        prefix = list_url[: list_url.rstrip("/").rfind("/") + 1]
        n = min(pages, max_pages)
        return [
            f"{prefix}{name}.{ext}" if i == 1 else f"{prefix}{name}_{i - 1}.{ext}"
            for i in range(1, n + 1)
        ]
    n = min(pages, max_pages)
    sep = "&" if "?" in list_url else "?"
    return [f"{list_url}{sep}page={i}" for i in range(1, n)]
