"""Text/content extraction — CJK metadata fields, dates, doc numbers, named
entities, plus the training-data text-analysis family (language id, quality
score, token counting, fingerprinting).

Reference semantics re-expressed (worker/ExtractContent.class.php):

- DOM→text linearization + boilerplate strip (M16/M17): here a regex
  tag-strip with block-tag newlines — the goal (text lines for the index-block
  scanner) is preserved without a DOM lib.
- index-block lines (M19): squashed lines matching ``^<2-8 CJK chars><：:|】]>``
  key:value metadata shape (:525-542).
- summary fields (M20): CJK label-synonym table → {title, author, tags,
  index_ori_no, doc_ori_no, publish_time, t_valid, keywords} (:397-517,
  labels :162-174).
- date normalize (M21): ``YYYY[年-]M[月-]D[日]?`` → unix epoch (:206-221).
- doc-number normalize (M22): ``机关〔YYYY〕N号`` → canonical form (:227-241).
- named entities (M23): all ``《…》`` spans, uniq, order-preserving (:823-832).
- title guess (M24): <title> split on _/- first token (:548-583).
- t_valid sentence scan (M26): ``自YYYY年M月D日起施行`` (:607-616).
- edit distance (M31): standard Levenshtein DP (:354-395).

The text-analysis extras at the bottom are new first-class operators for the
100 TB training-data pipeline (not in the reference): n-gram language id,
length/punct/stopword quality scoring, whitespace+BPE-ish token counting,
rolling-hash fingerprints.
"""

from __future__ import annotations

import calendar
import re

import numpy as np

_BLOCK_TAGS_RE = re.compile(r"<(?:br|/?(?:div|p|tr|ul|ol|li|h[1-6]|table))\b[^>]*>", re.IGNORECASE)
_TD_RE = re.compile(r"</t[dh]\s*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_WS_LINE_RE = re.compile(r"[ \t　]+")

# M19 — key:value metadata line: 2-8 CJK chars then a separator
_INDEX_LINE_RE = re.compile(r"^([一-鿿][一-鿿\s　]{1,10})[：:|】\]](.*)$")

# M20 — label synonym table (subset of the reference's ~40, same shape)
_LABELS = {
    "title": ("标题", "标 题", "名称", "信息名称"),
    "index_ori_no": ("索引号", "索 引 号"),
    "doc_ori_no": ("发文字号", "文号", "发文号", "文件编号"),
    "author": ("发文机关", "发布机构", "发文单位", "制发机关"),
    "tags": ("主题分类", "分类", "体裁分类"),
    "publish_time": ("发布日期", "发布时间", "印发日期", "公布日期"),
    "cwrq": ("成文日期", "成文时间"),
    "keywords": ("主题词", "关键词"),
    "t_valid": ("施行日期", "生效日期", "实施日期"),
    "t_invalid": ("废止日期", "失效日期"),
}
_LABEL_TO_FIELD = {syn: f for f, syns in _LABELS.items() for syn in syns}

_DATE_RE = re.compile(r"(\d{4})\s*[年\-/.]\s*(\d{1,2})\s*[月\-/.]\s*(\d{1,2})\s*日?")
# M22 — 机关〔YYYY〕第N号 (any bracket family)
_DOCNO_RE = re.compile(
    r"([一-鿿]{2,12})\s*[\(（\[〔【]\s*(\d{4})\s*[\)）\]〕】]\s*第?\s*(\d+)\s*号"
)
_NEG_RE = re.compile(r"《([^《》]{1,60})》")
_TVALID_RE = re.compile(r"自\s*(\d{4})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日\s*起\s*施行")


_IMG_SRC_RE = re.compile(r"<img\s[^>]*?src\s*=\s*([\"']?)([^\"'\s>]+)\1[^>]*>",
                         re.IGNORECASE | re.DOTALL)


def html_to_lines(html: str, keep_img: bool = False, base_url: str = "") -> list[str]:
    """M16/M17 — strip boilerplate tags, linearize to squashed text lines.

    ``keep_img``: replace each ``<img src>`` with a ``[tag:img:URL]``
    placeholder line (resolved against ``base_url``), the reference's
    keep_img mode (ExtractContent.class.php:293-300).  Table cells keep
    ``|`` separators, nested tables opening a fresh line — the flat analog
    of the reference's td/th recursion (:313-337)."""
    html = _SCRIPT_STYLE_RE.sub(" ", html)
    if keep_img:
        from . import urltools as ut

        def _img_ph(m: re.Match) -> str:
            src = m.group(2).strip()
            url = (ut.resolve(base_url, src) if base_url else "") or src
            return f"\n[tag:img:{url}]\n"

        html = _IMG_SRC_RE.sub(_img_ph, html)
    html = _TD_RE.sub("|", html)
    html = _BLOCK_TAGS_RE.sub("\n", html)
    text = _TAG_RE.sub("", html)
    import html as _h

    text = _h.unescape(text)
    # _WS_LINE_RE matches only intra-line whitespace ([ \t　]+, never \n),
    # so one pass over the whole text ≡ the per-line sub it replaces; the
    # squash changes nothing unless a tab, ideographic space, or double
    # space is present, so three C-speed scans skip the rebuild entirely
    # for typical CJK text
    text = text.replace("\r", "\n")
    if "\t" in text or "　" in text or "  " in text:
        text = _WS_LINE_RE.sub(" ", text)
    lines = []
    for ln in text.split("\n"):
        ln = ln.strip()
        if ln:
            lines.append(ln)
    return lines


def index_block(lines: list[str]) -> list[tuple[str, str]]:
    """M19 — (label, value) pairs from key:value metadata lines."""
    out = []
    for ln in lines:
        m = _INDEX_LINE_RE.match(ln)
        if m:
            out.append((m.group(1).replace(" ", "").replace("　", ""), m.group(2).strip()))
    return out


def parse_cjk_date(s: str) -> int:
    """M21 — first ``YYYY年M月D日``-family date in s → unix epoch secs, else 0."""
    m = _DATE_RE.search(s)
    if not m:
        return 0
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1900 <= y <= 2100 and 1 <= mo <= 12 and 1 <= d <= 31):
        return 0
    try:
        return calendar.timegm((y, mo, d, 0, 0, 0))
    except ValueError:
        return 0


def normalize_doc_no(s: str) -> str:
    """M22 — canonical ``机关〔YYYY〕N号`` form, '' when absent."""
    m = _DOCNO_RE.search(s)
    if not m:
        return ""
    return f"{m.group(1)}({m.group(2)}){m.group(3)}号"


def named_entities(text: str) -> list[str]:
    """M23 — unique 《…》 spans in first-seen order."""
    out, seen = [], set()
    for m in _NEG_RE.finditer(text):
        v = m.group(1)
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def t_valid_scan(text: str) -> int:
    """M26 — ``自YYYY年M月D日起施行`` → epoch secs, else 0."""
    m = _TVALID_RE.search(text)
    if not m:
        return 0
    return parse_cjk_date(f"{m.group(1)}年{m.group(2)}月{m.group(3)}日")


def title_guess(title_tag: str) -> str:
    """M24 — first token of <title> split on _/-."""
    return re.split(r"[_\-]", title_tag)[0].strip()


def extract_summary(lines: list[str], title_tag: str = "") -> dict[str, object]:
    """M20 — the metadata record for a detail page."""
    fields: dict[str, object] = {
        "title": "", "index_ori_no": "", "doc_ori_no": "", "author": "",
        "tags": "", "keywords": "", "publish_time": 0, "t_valid": 0, "t_invalid": 0,
    }
    for label, value in index_block(lines):
        f = _LABEL_TO_FIELD.get(label)
        if f is None or not value:
            continue
        if f in ("publish_time", "t_valid", "t_invalid"):
            if not fields[f]:
                fields[f] = parse_cjk_date(value)
        elif f == "cwrq":
            if not fields["publish_time"]:
                fields["publish_time"] = parse_cjk_date(value)
        elif f == "doc_ori_no":
            if not fields[f]:
                fields[f] = normalize_doc_no(value) or value
        elif not fields[f]:
            fields[f] = value
    if not fields["title"] and title_tag:
        fields["title"] = title_guess(title_tag)
    full = "\n".join(lines)
    if not fields["doc_ori_no"]:
        fields["doc_ori_no"] = normalize_doc_no(full)
    if not fields["t_valid"]:
        fields["t_valid"] = t_valid_scan(full)
    return fields


# M27 — statute TOC markers: 第N章 (chapter) / 第N节 (section) / 第N条
# (article), CJK numerals, kinds per ExtractContent.class.php:196-200
_TOC_RE = re.compile(r"第[一二三四五六七八九十百千]+[章节条]")
_TOC_KIND = {"章": "zhang", "节": "section", "条": "tiao"}


def toc_markers(text: str) -> list[tuple[str, str]]:
    """(marker, kind) occurrences in document order — the statute outline."""
    return [(m.group(0), _TOC_KIND[m.group(0)[-1]]) for m in _TOC_RE.finditer(text)]


def toc_outline(text: str) -> list[dict]:
    """Structured outline: one entry per marker with its line's heading text
    (the index-block use the reference declares the patterns for)."""
    out = []
    for ln in text.split("\n"):
        for marker, kind in toc_markers(ln):
            out.append({"marker": marker, "kind": kind, "heading": ln.strip()})
    return out


# ---------------------------------------------------------------------------
# M18 / A3 / M28 — main-content extraction

_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.IGNORECASE | re.DOTALL)
_A_TEXT_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_BLOCK_OPEN_CLOSE_RE = re.compile(r"<(/?)(div|ul|ol)\b[^>]*>", re.IGNORECASE)
_SQUASH_RE = re.compile(r"\s+")


def p_texts(html: str) -> list[str]:
    """The ``<p>`` text lines (the reference's ``textP`` accumulator,
    ExtractContent.class.php:308-310)."""
    import html as _h

    html = _SCRIPT_STYLE_RE.sub(" ", html)
    out = []
    # Each regex pass below runs only when it could change the fragment
    # (fetch hot path: clean CJK <p> bodies carry no tags/entities and
    # already-single spaces, so the common case is three C-speed scans and
    # zero string rebuilds instead of three sub passes per paragraph).
    for m in _P_RE.finditer(html):
        t = m.group(1)
        if "<" in t:
            t = _TAG_RE.sub("", t)
        if "&" in t:
            t = _h.unescape(t)
        if "\t" in t or "　" in t or "  " in t:
            t = _WS_LINE_RE.sub(" ", t)
        t = t.strip()
        if t:
            out.append(t)
    return out


def char_ratio(html: str) -> float:
    """A3 — whitespace-stripped ``<p>``-chars over all text chars
    (ExtractContent.class.php:626-630): the signal that decides between the
    p-based and line-density extraction paths."""
    p = _SQUASH_RE.sub("", "".join(p_texts(html)))
    t = _SQUASH_RE.sub("", "".join(html_to_lines(html)))
    return len(p) / len(t) if t else 0.0


def _block_tree(html: str) -> list[tuple[int, int, int, int, list]]:
    """Top-level div/ul/ol blocks as (start, end, inner_start, inner_end,
    children) — a tag-stack scan standing in for the DOM the container
    lacks; sloppy HTML (unclosed tags) degrades gracefully."""
    roots: list = []
    stack: list = []  # (name, start, inner_start, children)
    for m in _BLOCK_OPEN_CLOSE_RE.finditer(html):
        closing, name = bool(m.group(1)), m.group(2).lower()
        if not closing:
            stack.append((name, m.start(), m.end(), []))
        else:
            if not any(fr[0] == name for fr in stack):
                continue  # stray close tag
            while stack:
                n, s, ins, kids = stack.pop()
                if n == name:
                    node = (s, m.end(), ins, m.start(), kids)
                    (stack[-1][3] if stack else roots).append(node)
                    break
                # unclosed open tag: promote its children upward
                (stack[-1][3] if stack else roots).extend(kids)
    while stack:  # trailing unclosed opens
        _, _, _, kids = stack.pop()
        (stack[-1][3] if stack else roots).extend(kids)
    return roots


def link_block_spans(html: str) -> list[tuple[int, int]]:
    """M28 — spans of nav/link blocks: a div/ul/ol whose anchor text
    dominates (>0.6 of block text) with short average anchor length
    (1 < avg < 6), checked top-down with short-circuit like the reference
    (ExtractContent.class.php:946-983)."""
    spans: list[tuple[int, int]] = []

    def visit(nodes) -> None:
        for s, e, ins, ine, kids in nodes:
            inner = html[ins:ine]
            block_text = _SQUASH_RE.sub("", _TAG_RE.sub("", inner))
            anchors = _A_TEXT_RE.findall(inner)
            a_texts = [_SQUASH_RE.sub("", _TAG_RE.sub("", a)) for a in anchors]
            a_len = sum(len(a) for a in a_texts)
            avg = a_len // len(anchors) if anchors else 0
            if block_text and a_len / len(block_text) > 0.6 and 1 < avg < 6:
                spans.append((s, e))
            else:
                visit(kids)

    visit(_block_tree(html))
    return spans


def _splice_out(html: str, spans: list[tuple[int, int]]) -> str:
    if not spans:
        return html
    out, pos = [], 0
    for s, e in sorted(spans):
        if s < pos:
            continue  # nested inside an already-removed span
        out.append(html[pos:s])
        out.append(" ")
        pos = e
    out.append(html[pos:])
    return "".join(out)


def suppress_link_blocks(html: str) -> str:
    """Remove detected link blocks (the reference removes the DOM nodes
    before extraction)."""
    return _splice_out(html, link_block_spans(html))


# M17 — the reference's class-keyed boilerplate list: XPath rules matching
# an attribute EXACTLY (ExtractContent.class.php:136-139, applied :896-903).
# (tag, attribute, exact value); $DefaultSpecialTags script/style/link are
# already stripped by the regex pre-pass.
DEFAULT_SPECIAL_CLASSES = (
    ("div", "class", "nav"),
    ("div", "class", "container top"),
    ("div", "class", "head container"),
    ("div", "id", "footer"),
)
_ATTR_RES: dict[str, re.Pattern] = {}


def special_class_spans(html: str, rules=DEFAULT_SPECIAL_CLASSES) -> list[tuple[int, int]]:
    """Spans of blocks whose open tag matches a (tag, attr, value) rule —
    the whole subtree is removed, children unvisited (removeChild drops the
    subtree in the reference)."""
    spans: list[tuple[int, int]] = []
    tag_rules: dict[str, list[tuple[str, str]]] = {}
    for tag, attr, val in rules:
        tag_rules.setdefault(tag.lower(), []).append((attr.lower(), val))

    def open_tag_matches(s: int, ins: int) -> bool:
        tag_html = html[s:ins]
        name = re.match(r"<\s*([a-zA-Z0-9]+)", tag_html)
        if not name:
            return False
        for attr, val in tag_rules.get(name.group(1).lower(), ()):
            rx = _ATTR_RES.get(attr)
            if rx is None:
                rx = _ATTR_RES.setdefault(
                    attr, re.compile(rf"\b{attr}\s*=\s*([\"'])(.*?)\1", re.IGNORECASE)
                )
            m = rx.search(tag_html)
            if m and m.group(2).strip() == val:
                return True
        return False

    def visit(nodes) -> None:
        for s, e, ins, ine, kids in nodes:
            if open_tag_matches(s, ins):
                spans.append((s, e))
            else:
                visit(kids)

    visit(_block_tree(html))
    return spans


def remove_special_blocks(html: str, rules=DEFAULT_SPECIAL_CLASSES) -> str:
    """M17 — delete nav/header/footer blocks by the class-rule list ahead of
    the link-block heuristic (a verbose footer that is not link-dense still
    goes)."""
    return _splice_out(html, special_class_spans(html, rules))


def line_block_density(lines: list[str], blocksize: int = 3) -> str:
    """M18 fallback — line-block density extraction: squash each line,
    slide a ``blocksize`` window of char counts, keep the contiguous
    nonzero-density run with the most text
    (ExtractContent.class.php:645-706; the classic text-density method)."""
    sq = [_SQUASH_RE.sub("", ln) for ln in lines]
    n = len(sq)
    if n == 0:
        return ""
    lens = np.array([len(s) for s in sq], dtype=np.int64)
    bs = min(n, blocksize)
    block = np.convolve(lens, np.ones(bs, dtype=np.int64), mode="valid")
    best_text, best_len = "", 0
    part: list[str] = []
    cur = 0
    for i in range(block.size):
        if block[i] > 0:
            if sq[i]:
                part.append(sq[i])
                cur += len(sq[i])
        else:
            part, cur = [], 0
        if cur > best_len:
            best_len, best_text = cur, "\n".join(part)
    return best_text


def main_content(html: str) -> str:
    """M18 — the extracted main content: link blocks suppressed (M28), then
    the p-based path when the p-char ratio (A3) clears the threshold, else
    line-block density extraction (ExtractContent.class.php:621-640).
    (Inlines char_ratio so p_texts/html_to_lines run once, not thrice.)"""
    html = remove_special_blocks(html)
    html = suppress_link_blocks(html)
    ps = p_texts(html)
    lines = None
    if ps:
        # non-ws char count == len after \s+　 squash (str.split() splits on
        # exactly the codepoints re's \s accepts for str, and 　 is Unicode
        # whitespace) — counts without building the squashed string
        p_len = sum(len(piece) for p in ps for piece in p.split())
        # provably-identical short-circuit (r5, fetch hot path): t_len (the
        # squashed char count of html_to_lines output) can never exceed
        # len(html) — tag stripping only removes characters and the td "|"
        # separators replace longer close-tags — so p_len/len(html) ≥ 0.01
        # already guarantees p_len/t_len ≥ 0.01 without paying the second
        # full html_to_lines pass set over the document
        if len(html) and p_len / len(html) >= 0.01:
            return "\n".join(ps)
        lines = html_to_lines(html)
        t_len = sum(len(piece) for ln in lines for piece in ln.split())
        if t_len and p_len / t_len >= 0.01:
            return "\n".join(ps)
    return line_block_density(lines if lines is not None else html_to_lines(html))


def edit_distance(a: str, b: str) -> int:
    """M31 — Levenshtein distance (numpy DP rows)."""
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    bs = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        sub = prev[:-1] + (bs != ord(ca))  # numpy broadcast: substitution costs
        cur = [i]
        for j in range(1, len(b) + 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, int(sub[j - 1])))
        prev = cur
    return int(prev[-1])


# ---------------------------------------------------------------------------
# Training-data text analysis (new operators, SURVEY.md "beyond the reference")

_STOPWORDS_EN = frozenset(
    "the of and a to in is was it for on as are with be by at this that from or an".split()
)
_WORD_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[一-鿿]")
_BPEISH_RE = re.compile(r"\w+|[^\w\s]")
_PUNCT_RE = re.compile(r"[^\w\s一-鿿]")


def lang_id(text: str) -> str:
    """n-gram/charclass heuristic language id: zh / en / other.
    Char-class counts run vectorized over the codepoint array (same values
    as the per-char formulation, ~40× faster on 2 KB samples)."""
    if not text:
        return "other"
    sample = text[:2000]
    n = len(sample)
    cp = np.frombuffer(sample.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    cjk = int(((cp >= 0x4E00) & (cp <= 0x9FFF)).sum())
    low = cp | np.uint32(0x20)  # ASCII case fold; only letters land in a-z
    latin = int(((low >= 0x61) & (low <= 0x7A) & (cp < 0x80)).sum())
    if cjk / n > 0.15:
        return "zh"
    if latin / n > 0.4:
        words = set(w.lower() for w in re.findall(r"[a-zA-Z]+", sample))
        return "en" if words & _STOPWORDS_EN else "other"
    return "other"


# BMP lookup table for re's \w-minus-CJK punct class, built lazily once per
# process: cell c == True iff chr(c) matches _PUNCT_RE ([^\w\s一-鿿]).  sre's
# str \w is Py_UNICODE_ISALNUM-or-underscore and \s is Py_UNICODE_ISSPACE —
# exactly chr(c).isalnum() / chr(c).isspace() — so the table is exact by
# construction; astral codepoints (≥0x10000) fall back to the regex path.
_PUNCT_BMP: np.ndarray | None = None


def _punct_bmp() -> np.ndarray:
    global _PUNCT_BMP
    if _PUNCT_BMP is None:
        t = np.ones(0x10000, dtype=bool)
        for c in range(0x10000):
            ch = chr(c)
            if ch.isalnum() or ch == "_" or ch.isspace():
                t[c] = False
        t[0x4E00:0xA000] = False  # 一-鿿 (already alnum, kept for clarity)
        _PUNCT_BMP = t
    return _PUNCT_BMP


_ALPHA_RE = re.compile(r"[a-zA-Z]+")


def quality_score(text: str) -> float:
    """length/punct/stopword-ratio quality heuristic in [0,1].
    (Punct counting and the latin-words short-circuit run vectorized over
    the sample's codepoint array — same values as the regex formulation,
    differential-tested in tests/test_hotpath_equiv.py.)"""
    if not text:
        return 0.0
    n = len(text)
    len_score = min(n / 500.0, 1.0) * (1.0 if n < 50_000 else 0.5)
    sample = text[:5000]
    cp = np.frombuffer(sample.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    if cp.size and int(cp.max()) >= 0x10000:  # astral chars: exact regex path
        n_punct = len(_PUNCT_RE.findall(sample))
        has_latin = bool(_ALPHA_RE.search(sample))
    else:
        n_punct = int(_punct_bmp()[cp].sum())
        low = cp | np.uint32(0x20)
        has_latin = bool(((low >= 0x61) & (low <= 0x7A) & (cp < 0x80)).any())
    punct_ratio = n_punct / min(n, 5000)
    punct_score = 1.0 - min(punct_ratio * 3.0, 1.0)
    words = [w.lower() for w in _ALPHA_RE.findall(sample)] if has_latin else []
    if words:
        stop_ratio = sum(w in _STOPWORDS_EN for w in words) / len(words)
        stop_score = min(stop_ratio * 4.0, 1.0)
    else:
        stop_score = 0.5  # neutral for non-latin text
    return round((len_score + punct_score + stop_score) / 3.0, 6)


def token_count(text: str, mode: str = "ws") -> int:
    """Token counting: ``ws`` whitespace split; ``bpe`` BPE-ish regex pieces."""
    if not text:
        return 0
    if mode == "ws":
        return len(text.split())
    return len(_BPEISH_RE.findall(text))


def fingerprint(text: str, window: int = 8) -> int:
    """Document fingerprint: min rolling Karp-Rabin hash over char windows —
    a winnowing-style stable 63-bit fingerprint."""
    if not text:
        return 0
    data = text.encode("utf-8", "surrogatepass")
    if len(data) <= window:
        h = 0
        for b in data:
            h = (h * 257 + b) & 0x7FFFFFFFFFFFFFFF
        return h
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    base = np.uint64(257)
    mask = np.uint64(0x7FFFFFFFFFFFFFFF)
    pw = np.uint64(1)
    for _ in range(window - 1):
        pw = (pw * base) & mask
    h = np.uint64(0)
    n = len(arr)
    hashes = np.empty(n - window + 1, dtype=np.uint64)
    for i in range(window):
        h = (h * base + arr[i]) & mask
    hashes[0] = h
    for i in range(window, n):
        h = ((h - arr[i - window] * pw) * base + arr[i]) & mask
        hashes[i - window + 1] = h
    return int(hashes.min())
