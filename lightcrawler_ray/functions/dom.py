"""M15 — real HTML→DOM parse on the stdlib ``html.parser`` tokenizer.

The reference parses every page into a DOM before extraction
(worker/ExtractContent.class.php:246-262 — PHP ``DOMDocument::loadHTML``,
i.e. libxml's error-tolerant HTML tree builder) and all of M16/M17/M18/M28
walk that tree.  The container has no third-party DOM lib, but the stdlib
tokenizer plus a small tree builder with HTML5-style implied end tags gives
the same tolerant tree.  This module provides that tree and DOM-backed
equivalents of the extraction entry points in ``texttools``:

- ``html_to_lines`` (M16/M17 linearization — block-tag line breaks,
  ``td``→``|`` cell separators, nested tables on fresh lines,
  ``[tag:img:URL]`` placeholders in keep_img mode),
- ``p_texts`` / ``main_content`` (M18/A3/M28 — class-rule and link-block
  subtree removal, p-ratio vs line-density path selection).

Contract: on well-formed HTML both parsers produce IDENTICAL output (the
differential tests in tests/test_dom.py enforce this over the synthetic
fixture corpus and generated trees); on adversarial HTML — ``>`` inside
quoted attributes, tags inside comments/CDATA, unclosed ``p``/``li``/``td``
— the DOM path matches browser/libxml behavior where the regex fast path
degrades.  The fast path stays the crawl default (``CrawlSpec.parse_mode=
"fast"``): it is value-identical on real pages and ~several× cheaper per
page, which at 100 TB is the difference between extraction riding along
inside the fetch wave and extraction becoming its own stage; ``parse_mode=
"dom"`` selects this module.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from . import texttools

VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# linearization: these open/close on a fresh line (texttools._BLOCK_TAGS_RE)
_BLOCK = frozenset(
    ["div", "p", "tr", "ul", "ol", "li", "table", "h1", "h2", "h3", "h4", "h5", "h6"]
)
# HTML5 implied end tags: opening `tag` auto-closes an open `scope` element,
# unless a `barrier` element intervenes on the stack
_AUTOCLOSE: dict[str, tuple[frozenset, frozenset]] = {
    **{t: (frozenset(["p"]), frozenset())
       for t in ("p", "div", "ul", "ol", "li", "table", "pre", "blockquote",
                 "h1", "h2", "h3", "h4", "h5", "h6", "form", "hr")},
    "li": (frozenset(["li", "p"]), frozenset(["ul", "ol"])),
    "td": (frozenset(["td", "th", "p"]), frozenset(["tr", "table"])),
    "th": (frozenset(["td", "th", "p"]), frozenset(["tr", "table"])),
    "tr": (frozenset(["tr", "td", "th", "p"]), frozenset(["table"])),
    "option": (frozenset(["option"]), frozenset(["select"])),
}

_WS_SQUASH = re.compile(r"\s+")


class Node:
    """One element: ``children`` holds Nodes and plain-str text nodes."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []

    def text(self, skip: frozenset = frozenset(("script", "style"))) -> str:
        """Concatenated descendant text in document order, ``skip`` subtrees
        excluded."""
        out: list[str] = []
        stack: list = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            elif c.tag not in skip:
                stack.extend(reversed(c.children))
        return "".join(out)

    def walk(self):
        """Yield (node, parent) over elements, pre-order."""
        stack = [(self, None)]
        while stack:
            n, p = stack.pop()
            yield n, p
            for c in reversed(n.children):
                if not isinstance(c, str):
                    stack.append((c, n))


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {})
        self.stack = [self.root]

    def _implied_ends(self, tag: str) -> None:
        rule = _AUTOCLOSE.get(tag)
        if not rule:
            return
        scope, barrier = rule
        # pop consecutive auto-closable frames from the top (stops at any
        # barrier or non-scope element — the libxml "has element in scope")
        while len(self.stack) > 1:
            top = self.stack[-1].tag
            if top in barrier or top not in scope:
                break
            self.stack.pop()

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self._implied_ends(tag)
        ad: dict[str, str] = {}
        for k, v in attrs:
            ad.setdefault(k.lower(), v if v is not None else "")
        node = Node(tag, ad)
        self.stack[-1].children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:  # <x/>
        tag = tag.lower()
        self._implied_ends(tag)
        ad: dict[str, str] = {}
        for k, v in attrs:
            ad.setdefault(k.lower(), v if v is not None else "")
        self.stack[-1].children.append(Node(tag, ad))

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]  # unclosed inner opens keep their subtree
                return
        # stray close tag: ignored (matches texttools._block_tree)

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)

    # comments / decls / PIs are dropped (libxml keeps comment NODES but the
    # reference's text walk never reads them)


def parse_html(html: str) -> Node:
    """M15 — error-tolerant HTML parse → element tree rooted at ``#root``."""
    tb = _TreeBuilder()
    try:
        tb.feed(html)
        tb.close()
    except Exception:
        pass  # tolerate tokenizer errors on garbage bytes; keep partial tree
    return tb.root


# ---------------------------------------------------------------------------
# M16/M17 — DOM→text linearization


def _emit(node: Node, out: list[str], keep_img: bool, base_url: str) -> None:
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
            continue
        t = c.tag
        if t in ("script", "style"):
            out.append(" ")
            continue
        if t == "br":
            out.append("\n")
            continue
        if t == "img":
            if keep_img:
                src = (c.attrs.get("src") or "").strip()
                if src:
                    from . import urltools as ut

                    url = (ut.resolve(base_url, src) if base_url else "") or src
                    out.append(f"\n[tag:img:{url}]\n")
            continue
        if t in ("td", "th"):
            _emit(c, out, keep_img, base_url)
            out.append("|")
        elif t in _BLOCK:
            out.append("\n")
            _emit(c, out, keep_img, base_url)
            out.append("\n")
        else:
            _emit(c, out, keep_img, base_url)


def dom_to_lines(root: Node, keep_img: bool = False, base_url: str = "") -> list[str]:
    """M16/M17 over a parsed tree — same output contract as
    ``texttools.html_to_lines`` (squashed non-empty lines)."""
    buf: list[str] = []
    _emit(root, buf, keep_img, base_url)
    lines = []
    for ln in "".join(buf).replace("\r", "\n").split("\n"):
        ln = texttools._WS_LINE_RE.sub(" ", ln).strip()
        if ln:
            lines.append(ln)
    return lines


def html_to_lines(html: str, keep_img: bool = False, base_url: str = "") -> list[str]:
    return dom_to_lines(parse_html(html), keep_img, base_url)


def p_texts_of(root: Node) -> list[str]:
    """All ``<p>`` inner texts (squashed, non-empty) in document order."""
    out = []
    for n, _ in root.walk():
        if n.tag == "p":
            t = texttools._WS_LINE_RE.sub(" ", n.text()).strip()
            if t:
                out.append(t)
    return out


def p_texts(html: str) -> list[str]:
    return p_texts_of(parse_html(html))


# ---------------------------------------------------------------------------
# M17/M28 — subtree removal on the tree (the reference's removeChild calls)


def remove_special_blocks(
    root: Node, rules=texttools.DEFAULT_SPECIAL_CLASSES
) -> None:
    """M17 — drop subtrees whose open tag matches a (tag, attr, value) rule
    exactly (ExtractContent.class.php:136-139,896-903).  In place."""
    tag_rules: dict[str, list[tuple[str, str]]] = {}
    for tag, attr, val in rules:
        tag_rules.setdefault(tag.lower(), []).append((attr.lower(), val))

    def visit(node: Node) -> None:
        kept = []
        for c in node.children:
            if isinstance(c, str):
                kept.append(c)
                continue
            if any(
                (c.attrs.get(a) or "").strip() == v
                for a, v in tag_rules.get(c.tag, ())
            ):
                continue  # subtree removed, children unvisited
            visit(c)
            kept.append(c)
        node.children = kept

    visit(root)


def remove_link_blocks(root: Node) -> None:
    """M28 — drop div/ul/ol subtrees whose anchor text dominates (>0.6 of
    block text, integer avg anchor length in (1,6)), top-down with
    short-circuit (ExtractContent.class.php:946-983).  In place."""

    def is_link_block(c: Node) -> bool:
        if c.tag not in ("div", "ul", "ol"):
            return False
        block_text = _WS_SQUASH.sub("", c.text(skip=frozenset()))
        if not block_text:
            return False
        a_texts = [
            _WS_SQUASH.sub("", n.text()) for n, _ in c.walk() if n.tag == "a"
        ]
        if not a_texts:
            return False
        a_len = sum(len(a) for a in a_texts)
        avg = a_len // len(a_texts)
        return a_len / len(block_text) > 0.6 and 1 < avg < 6

    def visit(node: Node) -> None:
        node.children = [
            c
            for c in node.children
            if isinstance(c, str) or not is_link_block(c)
        ]
        for c in node.children:
            if not isinstance(c, str):
                visit(c)

    visit(root)


def main_content(html: str) -> str:
    """M18 — DOM-path main-content extraction; same decision rule as
    ``texttools.main_content`` (p-char ratio ≥ 0.01 → p path, else
    line-block density), with M17/M28 removal done as real subtree drops."""
    root = parse_html(html)
    remove_special_blocks(root)
    remove_link_blocks(root)
    ps = p_texts_of(root)
    lines = None
    if ps:
        p_len = len(_WS_SQUASH.sub("", "".join(ps)))
        lines = dom_to_lines(root)
        t_len = len(_WS_SQUASH.sub("", "".join(lines)))
        if t_len and p_len / t_len >= 0.01:
            return "\n".join(ps)
    return texttools.line_block_density(
        lines if lines is not None else dom_to_lines(root)
    )
