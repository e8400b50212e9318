"""M15 — stdlib-DOM parse path vs the vectorized regex fast path.

Contract (functions/dom.py): identical output on well-formed HTML —
enforced differentially over the synthetic fixture corpus and a generated
corpus — and browser/libxml behavior on adversarial HTML where the regex
path degrades (the reference parses with DOMDocument::loadHTML,
worker/ExtractContent.class.php:246-262)."""

from __future__ import annotations

import random

import pyarrow.parquet as pq
import pytest

from lightcrawler_ray.functions import dom, texttools
from lightcrawler_ray.sources import synth


@pytest.fixture(scope="module")
def fixture_bodies():
    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    paths = synth.ensure_fixtures(p)
    t = pq.read_table(paths["pages"], columns=["url", "body", "content_type"])
    out = []
    for u, b, ct in zip(
        t.column("url").to_pylist(),
        t.column("body").to_pylist(),
        t.column("content_type").to_pylist(),
    ):
        if ct.startswith("text/html") and b:
            out.append((u, b.decode("utf-8", "replace")))
    assert len(out) > 100
    return out


class TestDifferentialFixtures:
    def test_lines_equal(self, fixture_bodies):
        for u, html in fixture_bodies:
            assert dom.html_to_lines(html) == texttools.html_to_lines(html), u

    def test_lines_keep_img_equal(self, fixture_bodies):
        for u, html in fixture_bodies[:50]:
            assert dom.html_to_lines(html, keep_img=True, base_url=u) == \
                texttools.html_to_lines(html, keep_img=True, base_url=u), u

    def test_p_texts_equal(self, fixture_bodies):
        for u, html in fixture_bodies:
            assert dom.p_texts(html) == texttools.p_texts(html), u

    def test_main_content_equal(self, fixture_bodies):
        for u, html in fixture_bodies:
            assert dom.main_content(html) == texttools.main_content(html), u


def _gen_html(rng: random.Random, depth: int = 0) -> str:
    """Deterministic well-formed HTML: closed tags, no blocks inside <p>,
    no comments — the domain where both parsers must agree exactly."""
    words = ["data", "网络", "pipeline", "第三条", "ray", "《条例》", "x&amp;y", "a&lt;b"]
    parts = []
    for _ in range(rng.randint(1, 5)):
        r = rng.random()
        if r < 0.35 or depth >= 3:
            parts.append(rng.choice(words) + " ")
        elif r < 0.5:
            parts.append(f"<p>{rng.choice(words)} <b>{rng.choice(words)}</b></p>")
        elif r < 0.62:
            parts.append(f"<a href='/l{rng.randint(0, 9)}'>{rng.choice(words)}</a>")
        elif r < 0.72:
            cells = "".join(f"<td>{rng.choice(words)}</td>" for _ in range(rng.randint(1, 3)))
            parts.append(f"<table><tr>{cells}</tr></table>")
        elif r < 0.8:
            items = "".join(f"<li>{rng.choice(words)}</li>" for _ in range(rng.randint(1, 3)))
            parts.append(f"<ul>{items}</ul>")
        elif r < 0.88:
            parts.append(f"<div class='c{rng.randint(0, 3)}'>{_gen_html(rng, depth + 1)}</div>")
        elif r < 0.94:
            parts.append("<br>")
        else:
            parts.append(f"<script>var x = '<div>not text</div>';</script>")
    return "".join(parts)


def test_generated_corpus_differential():
    for seed in range(200):
        rng = random.Random(seed)
        html = f"<html><head><title>t{seed}</title></head><body>{_gen_html(rng)}</body></html>"
        assert dom.html_to_lines(html) == texttools.html_to_lines(html), seed
        assert dom.p_texts(html) == texttools.p_texts(html), seed
        assert dom.main_content(html) == texttools.main_content(html), seed


class TestDomSuperiority:
    """Adversarial HTML: the DOM path must match browser semantics."""

    def test_gt_inside_quoted_attr(self):
        html = "<div><a title=\"x > y\">link</a> tail</div>"
        assert dom.html_to_lines(html) == ["link tail"]

    def test_tags_inside_comment_dropped(self):
        html = "<div>keep<!-- <p>ghost</p> --></div>"
        assert dom.html_to_lines(html) == ["keep"]
        assert dom.p_texts(html) == []

    def test_unclosed_p_autocloses(self):
        # libxml/HTML5: a new <p> (or block) ends the open one
        assert dom.p_texts("<p>a<p>b</p>") == ["a", "b"]
        assert dom.p_texts("<p>a<div>block</div>") == ["a"]

    def test_unclosed_li_td(self):
        assert dom.html_to_lines("<ul><li>a<li>b</ul>") == ["a", "b"]
        assert dom.html_to_lines("<table><tr><td>a<td>b</table>") == ["a|b|"]

    def test_mismatched_close_ignored(self):
        assert dom.html_to_lines("<div>a</span></div>") == ["a"]

    def test_nested_table_fresh_lines(self):
        html = ("<table><tr><td>outer<table><tr><td>in1</td><td>in2</td></tr>"
                "</table></td><td>right</td></tr></table>")
        lines = dom.html_to_lines(html)
        assert "in1|in2|" in lines and any("outer" in ln for ln in lines)
        assert lines == texttools.html_to_lines(html)  # fast path agrees here

    def test_keep_img_placeholder_resolved(self):
        html = '<div><img src="pic/a.png">x</div>'
        lines = dom.html_to_lines(html, keep_img=True, base_url="http://h/base/p.html")
        assert lines == ["[tag:img:http://h/base/pic/a.png]", "x"]

    def test_special_class_removal_subtree(self):
        html = ('<div id="footer"><p>版权所有 footer verbose text</p></div>'
                "<div><p>real body paragraph with enough text</p></div>")
        assert "footer" not in dom.main_content(html)
        assert "real body" in dom.main_content(html)

    def test_link_block_removed(self):
        nav = "<ul>" + "".join(f"<li><a href='/n{i}'>栏目{i}</a></li>" for i in range(8)) + "</ul>"
        html = f"{nav}<div><p>正文内容段落，足够长的正文文本。</p></div>"
        mc = dom.main_content(html)
        assert "栏目" not in mc and "正文内容" in mc


def test_parse_mode_wiring_and_doc_parity(fixture_bodies):
    """CrawlSpec.parse_mode='dom' binds the DOM extractors in the fetch
    worker, and the doc rows it produces on the fixture corpus are
    value-identical to the fast path's."""
    from lightcrawler_ray.stages.fetch import SyntheticFetchExtract

    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    paths = synth.ensure_fixtures(p)
    fast = SyntheticFetchExtract(paths["pages"], paths["images"])
    domf = SyntheticFetchExtract(paths["pages"], paths["images"], parse_mode="dom")
    assert fast._main_content is texttools.main_content
    assert domf._main_content is dom.main_content

    import hashlib

    checked = 0
    for u, _ in fixture_bodies[:40]:
        fr = {"url": u, "url_md5": hashlib.md5(u.encode()).hexdigest(),
              "host": u.split("/")[2], "depth": 1, "priority": 0,
              "enqueue_seq": checked, "referer": "", "linktext": ""}
        d_fast = [r for r in fast._process_one(fr) if r["kind"] == "doc"]
        d_dom = [r for r in domf._process_one(fr) if r["kind"] == "doc"]
        for a, b in zip(d_fast, d_dom):
            assert a["content"] == b["content"], u
            assert a["doc_id"] == b["doc_id"] and a["simhash"] == b["simhash"], u
            assert a["title"] == b["title"] and a["doc_ori_no"] == b["doc_ori_no"], u
        checked += len(d_fast)
    assert checked > 10, "fixture slice produced too few doc rows to compare"
