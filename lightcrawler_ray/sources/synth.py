"""Deterministic synthetic fixtures (FIXTURES.md F1-F3) — no network, no
external data; everything is a pure function of (size params, seed).

- ``build_images``    — F1: the Lance/Parquet image+caption payload table with
  the exact input_hint schema, ~1% phash near-dups and ~1% exact dups.
- ``build_hostgraph`` — F3: a synthetic web (url → status/headers/body) whose
  HTML bodies exercise the full link-form case table of the reference resolver
  (PHPCrawlerUtils.class.php:234-328), `<img>` tags that point at F1 rows,
  pagination JS vars (M29), CJK metadata blocks (M19-M22), redirects, 404s,
  permanently-failing and flaky rows (retry path), and per-host robots rules.
- ``build_seeds``     — F2: un-normalized seed URLs (mixed-case hosts, ``:80``,
  ``../``, fragments, shuffled query params) to exercise canonicalization.

``ensure_fixtures`` materializes all tables once under a /tmp cache dir keyed
by the parameters, so tests, queries() and bench share identical inputs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import hashing, imagecodec

_WORDS = (
    "ray data crawl frontier arrow batch actor lance image caption phash "
    "politeness robots shard cuckoo filter host depth priority epoch stream"
).split()
_CJK_CAPTIONS = ["国务院政策文件配图", "人民法院公告图片", "法律法规附件截图", "行政规章发布配图"]

IMG_HOST = "img.example.test"


# ---------------------------------------------------------------------------
# F1 — images


def _gen_pixels(i: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
    sizes = (32, 48, 64, 96, 128, 256)
    h = sizes[i % 5] if i % 37 else 256
    w = sizes[(i // 5) % 5] if i % 41 else 256
    base = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, (h + 7) // 8, axis=0), (w + 7) // 8, axis=1)[:h, :w]
    noise = rng.integers(-6, 7, size=img.shape, dtype=np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def _caption(i: int) -> str:
    if i % 7 == 3:
        return f"{_CJK_CAPTIONS[i % len(_CJK_CAPTIONS)]} 第{i}号"
    ws = " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range(4))
    return f"caption {i}: {ws}"


def _image_rec(i: int, seed: int) -> tuple[np.ndarray, bytes, str]:
    """(pixels, blob, fmt) for image i — pure function of (i, seed).
    i%97==1 → near-dup of i-1 (same pixels, re-encoded lossy); i%101==1 →
    exact byte dup of i-1.  Recursive so any index can be generated
    independently (parallel generation produces identical rows)."""
    if i % 101 == 1 and i > 0:
        _, blob_prev, fmt_prev = _image_rec(i - 1, seed)
        return imagecodec.decode(blob_prev), blob_prev, fmt_prev
    if i % 97 == 1 and i > 0:
        px_prev, _, _ = _image_rec(i - 1, seed)
        return px_prev, imagecodec.encode(px_prev, "jpeg"), "jpeg"
    px = _gen_pixels(i, seed)
    fmt = ("png", "jpeg", "bmp")[i % 3]
    return px, imagecodec.encode(px, fmt), fmt


def _image_rows_range(lo: int, hi: int, seed: int) -> pa.Table:
    from ..schemas import IMAGES

    ids, blobs, ws, hs, fs, caps, phs = [], [], [], [], [], [], []
    for i in range(lo, hi):
        px, blob, fmt = _image_rec(i, seed)
        dec = imagecodec.decode(blob)
        ids.append(f"img-{i:08d}")
        blobs.append(blob)
        hs.append(dec.shape[0])
        ws.append(dec.shape[1])
        fs.append(fmt)
        caps.append(_caption(i))
        phs.append(hashing.phash64(dec))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fs, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
        },
        schema=IMAGES,
    )


def build_images(n: int, seed: int = 42) -> pa.Table:
    """F1 image+caption table (serial; see build_images_parallel)."""
    return _image_rows_range(0, n, seed)


def build_images_parallel(n: int, seed: int = 42, chunk: int = 500) -> pa.Table:
    """Same table as build_images, generated as Ray tasks per index range —
    used by ensure_fixtures for large fixtures when Ray is up."""
    import ray

    @ray.remote
    def gen(lo: int, hi: int) -> pa.Table:
        return _image_rows_range(lo, hi, seed)

    refs = [gen.remote(lo, min(lo + chunk, n)) for lo in range(0, n, chunk)]
    return pa.concat_tables(ray.get(refs))


# ---------------------------------------------------------------------------
# F3 — hostgraph


@dataclass
class GraphParams:
    n_pages: int = 2000
    n_hosts: int = 20
    n_images: int = 500
    seed: int = 42
    out_degree: int = 8
    body_repeat: int = 1        # filler paragraphs per detail page (page weight)
    images_per_detail: int = 1  # base images per detail page (payload weight)
    n_seeds: int = 4            # seed-list size (frontier fan-out)


_CDF_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _host_of_page(i: int, p: GraphParams) -> int:
    """Zipf-ish host assignment: host h owns a share ∝ 1/(h+1) of pages —
    host 0 is hot (the skew case of SURVEY.md §4).  splitmix64 hash →
    inverse-CDF: ~1 µs/call (a per-page default_rng was the fixture
    generator's hotspot)."""
    key = (p.seed, p.n_hosts)
    cdf = _CDF_CACHE.get(key)
    if cdf is None:
        w = 1.0 / np.arange(1, p.n_hosts + 1)
        cdf = np.cumsum(w / w.sum())
        _CDF_CACHE[key] = cdf
    m = (1 << 64) - 1
    x = ((p.seed * 7919 + i) * 0x9E3779B97F4A7C15) & m
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & m
    x ^= x >> 27
    u = x / float(1 << 64)
    return int(np.searchsorted(cdf, u, side="right"))


def page_url(i: int, p: GraphParams) -> str:
    return f"http://h{_host_of_page(i, p):03d}.example.test/p/{i}.html"


def image_url(image_id: str) -> str:
    return f"http://{IMG_HOST}/img/{image_id}.bin"


_LINK_FORMS = 7


def _render_link(target_url: str, form: int, source_url: str) -> str | None:
    """Render the target in one of the resolver case-table forms; returns the
    href text, or None when this form can't express the target from here."""
    from ..functions import urltools as ut

    tp, sp = ut.split_url(target_url), ut.split_url(source_url)
    if form == 0:
        return target_url
    if form == 1:  # mixed-case scheme/host + explicit :80 + fragment
        return target_url.replace("http://", "HTTP://").replace(
            str(tp["host"]), str(tp["host"]).upper() + ":80", 1
        ) + "#sec2"
    if form == 2:  # scheme-relative
        return "//" + str(tp["host"]) + str(tp["path"]) + str(tp["file"])
    if form == 3:  # rooted
        if tp["host"] != sp["host"]:
            return None
        return str(tp["path"]) + str(tp["file"])
    if form == 4:  # bare relative (same dir)
        if tp["host"] != sp["host"] or tp["path"] != sp["path"]:
            return None
        return str(tp["file"])
    if form == 5:  # ../-relative
        if tp["host"] != sp["host"]:
            return None
        return "../p/" + str(tp["file"])
    if form == 6:  # ./-relative
        if tp["host"] != sp["host"] or tp["path"] != sp["path"]:
            return None
        return "./" + str(tp["file"])
    return target_url


_CJK_BODY = """<div class="detail">
<p>索引号：000014349/2020-{i:05d}</p>
<p>发文字号：国发〔20{yy:02d}〕{no}号</p>
<p>发布日期：20{yy:02d}年{m}月{d}日</p>
<p>成文日期：20{yy:02d}年{m}月{d}日</p>
<p>主题分类：综合政务</p>
<p>发文机关：国务院办公厅</p>
<p>标  题：关于{word}工作的通知（20{yy:02d}）</p>
<p>正文第一段：依据《中华人民共和国网络安全法》和《数据安全条例》开展{word}工作。</p>
<p>本通知自20{yy:02d}年{m}月{d}日起施行。</p>
</div>"""


def _page_rows_range(
    lo: int, hi: int, p: GraphParams, image_ids: list[str], captions: list[str]
) -> pa.Table:
    """Page rows for indices [lo, hi) — pure in (p, images), so ranges can be
    generated in parallel and concatenated into the identical table."""
    from ..functions import urltools as ut

    import calendar
    import re as _re

    n = p.n_pages
    urls, hosts, statuses, ctypes, bodies = [], [], [], [], []
    fails, links_col, imgs_col, locations = [], [], [], []
    # generation-time TRUTH columns (what the page semantically contains —
    # the extraction stages must recover these; they power the crawl_docs
    # DuckDB oracle).  Pure template knowledge, never extractor output.
    t_kind, t_title, t_ori, t_pub, t_content = [], [], [], [], []
    for i in range(lo, hi):
        url = page_url(i, p)
        sp = ut.split_url(url)
        host = str(sp["host"])
        rng = np.random.default_rng(np.uint64(p.seed) * np.uint64(104729) + np.uint64(i))
        status, ctype, body, loc, fail = 200, "text/html", "", "", 0
        gt_links: list[str] = []
        gt_imgs: list[str] = []
        kind, title_t, ori_t, pub_t, content_t = "error", "", "", 0, ""
        if i % 31 == 7:
            status, body = 500, "<html>server error</html>"
        elif i % 23 == 5:
            status, body = 404, "<html>not found</html>"
        elif i % 17 == 3:
            status, loc = 301, page_url((i + 1) % n, p)
            gt_links = [loc]
            kind = "redirect"
        else:
            if i % 29 == 11:
                fail = 1 + i % 2
            targets = rng.integers(0, n, size=p.out_degree)
            hrefs = []
            seen_local: set[str] = set()
            for j, t in enumerate(targets):
                turl = page_url(int(t), p)
                href = _render_link(turl, (i + j) % _LINK_FORMS, url) or turl
                canon = ut.resolve(url, href)
                hrefs.append(f'<a href="{href}">link {int(t)} text</a>')
                if canon and canon not in seen_local:
                    seen_local.add(canon)
                    gt_links.append(canon)
            # noise links the extractor must drop
            hrefs.append('<a href="javascript:void(0)">js</a>')
            hrefs.append('<a href="#top">top</a>')
            hrefs.append('<a href="mailto:a@b.c">mail</a>')
            filler = "".join(
                f"<p>正文段落{j}：依照《条例{j % 19}》第{j % 87}条落实"
                f"{_WORDS[(i + j) % len(_WORDS)]} {_WORDS[(i * 7 + j) % len(_WORDS)]}"
                f" {_WORDS[(i * 13 + j * 3) % len(_WORDS)]}工作要求，持续推进专项治理。</p>"
                for j in range(p.body_repeat - 1)
            )
            if i % 5 == 0:
                count = 2 + i % 3
                body = (
                    f"<html><head><title>列表页 {i}_index</title></head><body>"
                    f"<script>var countPage = {count};var m_nPageIndex = 0;</script>"
                    + "".join(hrefs)
                    + "</body></html>"
                )
                kind, title_t = "list", f"列表页 {i}"
                # the index-block linearization (M19) strips all whitespace:
                # title text + link texts + the noise anchors, concatenated
                content_t = (
                    f"列表页{i}_index"
                    + "".join(f"link{int(t)}text" for t in targets)
                    + "jstopmail"
                )
            else:
                k = p.images_per_detail + i % 3
                img_tags = []
                for j in range(k):
                    idx = int(rng.integers(0, len(image_ids)))
                    iid = image_ids[idx]
                    gt_imgs.append(iid)
                    img_tags.append(
                        f'<img src="{image_url(iid)}" alt="{captions[idx]}">'
                    )
                word = _WORDS[i % len(_WORDS)]
                cjk = _CJK_BODY.format(
                    i=i, yy=i % 30, no=1 + i % 400, m=1 + i % 12, d=1 + i % 28, word=word
                )
                body = (
                    f"<html><head><title>政策文件{i}_国务院公报</title>"
                    '<meta charset="utf-8"><meta name="keywords" content="政策,法规">'
                    f"</head><body>{cjk}{filler}"
                    + "".join(img_tags)
                    + "".join(hrefs)
                    + "</body></html>"
                )
                yy, m, d = i % 30, 1 + i % 12, 1 + i % 28
                kind = "detail"
                title_t = f"关于{word}工作的通知（20{yy:02d}）"
                ori_t = f"国发(20{yy:02d}){1 + i % 400}号"
                pub_t = calendar.timegm((2000 + yy, m, d, 0, 0, 0))
                if p.body_repeat == 1:
                    # main content = the CJK metadata block's paragraph texts
                    # joined by newline, inner space runs collapsed (M16);
                    # with filler paragraphs (body_repeat > 1) the main-
                    # content boundary is extraction-dependent → no claim
                    content_t = _re.sub(
                        r"[ \t]+", " ",
                        "\n".join(_re.findall(r"<p>(.*?)</p>", cjk, _re.S)),
                    )
        urls.append(url)
        hosts.append(host)
        statuses.append(status)
        ctypes.append(ctype)
        bodies.append(body.encode("utf-8"))
        fails.append(fail)
        links_col.append(gt_links)
        imgs_col.append(gt_imgs)
        locations.append(loc)
        t_kind.append(kind)
        t_title.append(title_t)
        t_ori.append(ori_t)
        t_pub.append(pub_t)
        t_content.append(content_t)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "status": pa.array(statuses, pa.int16()),
            "content_type": pa.array(ctypes, pa.string()),
            "body": pa.array(bodies, pa.large_binary()),
            "location": pa.array(locations, pa.string()),
            "fail_attempts": pa.array(fails, pa.int16()),
            "links": pa.array(links_col, pa.list_(pa.string())),
            "images": pa.array(imgs_col, pa.list_(pa.string())),
            "t_kind": pa.array(t_kind, pa.string()),
            "t_title": pa.array(t_title, pa.string()),
            "t_ori": pa.array(t_ori, pa.string()),
            "t_pub": pa.array(t_pub, pa.int64()),
            "t_content": pa.array(t_content, pa.string()),
        }
    )


def build_robots(p: GraphParams) -> pa.Table:
    # robots: host 0 disallows /private/, every 4th host gets a crawl delay
    rhosts = [f"h{h:03d}.example.test" for h in range(p.n_hosts)] + [IMG_HOST]
    delays = [(200 if h % 4 == 0 else 0) for h in range(p.n_hosts)] + [0]
    disallow = [["/private/"] if h == 0 else [] for h in range(p.n_hosts)] + [[]]
    return pa.table(
        {
            "host": pa.array(rhosts, pa.string()),
            "delay_ms": pa.array(delays, pa.int32()),
            "disallow": pa.array(disallow, pa.list_(pa.string())),
        }
    )


def build_hostgraph(p: GraphParams, images: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Returns (pages, robots). Deterministic in p.seed.

    Page kinds by index: %31==7 → 500 (permanent error), %23==5 → 404,
    %17==3 → 301 redirect to (i+1), %29==11 → flaky (fails `1 + i%2`
    attempts, then 200 — exercises the retry≤3 path), %5==0 → list page with
    pagination JS, else detail page with CJK metadata + images + attachments.
    """
    image_ids = images.column("image_id").to_pylist()
    captions = images.column("caption").to_pylist()
    pages = _page_rows_range(0, p.n_pages, p, image_ids, captions)
    return pages, build_robots(p)


def build_hostgraph_parallel(p: GraphParams, images: pa.Table, chunk: int = 2000) -> tuple[pa.Table, pa.Table]:
    """Identical tables to build_hostgraph, page ranges generated as Ray tasks."""
    import ray

    image_ids = images.column("image_id").to_pylist()
    captions = images.column("caption").to_pylist()
    ids_ref = ray.put(image_ids)
    caps_ref = ray.put(captions)

    @ray.remote
    def gen(lo: int, hi: int, ids, caps) -> pa.Table:
        return _page_rows_range(lo, hi, p, ids, caps)

    refs = [
        gen.remote(lo, min(lo + chunk, p.n_pages), ids_ref, caps_ref)
        for lo in range(0, p.n_pages, chunk)
    ]
    return pa.concat_tables(ray.get(refs)), build_robots(p)


# ---------------------------------------------------------------------------
# F2 — seeds


def build_seeds(p: GraphParams, n_seeds: int | None = None) -> pa.Table:
    """Messy-on-purpose seed forms for the canonicalizer (FIXTURES.md F2)."""
    from ..functions import urltools as ut

    n_seeds = p.n_seeds if n_seeds is None else n_seeds
    rows = []
    for s in range(n_seeds):
        i = s * 97 % p.n_pages
        # pick a guaranteed-200 page as seed
        while i % 31 == 7 or i % 23 == 5 or i % 17 == 3:
            i = (i + 1) % p.n_pages
        url = page_url(i, p)
        sp = ut.split_url(url)
        messy = (
            f'HTTP://{str(sp["host"]).upper()}:80{sp["path"]}x/../{sp["file"]}#frag'
            if s % 2
            else url
        )
        rows.append({"url": messy, "depth": 0 if s == 0 else 1, "priority": 0,
                     "seed_idx": s})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("url", pa.string()), ("depth", pa.int32()), ("priority", pa.int32()),
         ("seed_idx", pa.int32())]
    ))


# ---------------------------------------------------------------------------
# cache


def ensure_fixtures(p: GraphParams | None = None, root: str = "/tmp/lcray_fixtures") -> dict[str, str]:
    """Materialize all fixture tables once; returns name → parquet path."""
    p = p or GraphParams()
    key = (  # v4: images_truth gained dhash + hist16 columns
        f"v4_p{p.n_pages}_h{p.n_hosts}_i{p.n_images}_s{p.seed}_d{p.out_degree}"
        f"_b{p.body_repeat}_k{p.images_per_detail}_n{p.n_seeds}"
    )
    d = os.path.join(root, key)
    paths = {
        name: os.path.join(d, f"{name}.parquet")
        for name in ("images", "pages", "robots", "seeds", "images_truth")
    }
    if all(os.path.exists(v) for v in paths.values()):
        return paths
    os.makedirs(d, exist_ok=True)
    try:
        import ray

        use_ray = ray.is_initialized() and p.n_pages * max(1, p.body_repeat) > 100_000
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray:
        images = build_images_parallel(p.n_images, p.seed)
        pages, robots = build_hostgraph_parallel(p, images)
    else:
        images = build_images(p.n_images, p.seed)
        pages, robots = build_hostgraph(p, images)
    seeds = build_seeds(p)
    pq.write_table(images, paths["images"])
    pq.write_table(pages, paths["pages"])
    pq.write_table(robots, paths["robots"])
    pq.write_table(seeds, paths["seeds"])
    pq.write_table(_images_truth(images), paths["images_truth"])
    return paths


def _images_truth(images: pa.Table) -> pa.Table:
    """Golden decode replay for the image-stat oracles: per image the decoded
    mean RGB (the stored w/h/fmt/caption/phash already ARE codec truth).
    Deterministic codec output replayed as a literal table — the DuckDB
    oracle then re-expresses only the pipeline-level transform, which is
    what the distributed run can get wrong."""
    from ..extras.multimodal import ImageDecodeStats

    t = ImageDecodeStats()(images.select(["image_id", "bytes"]))
    return t.select(["image_id", "mean_rgb", "phash", "dhash", "hist16", "decoded"])


# ---------------------------------------------------------------------------
# F4 — routed site (M11/M25/M29 at bench scale)


@dataclass
class RoutedSiteParams:
    """A list/detail/attachment site in the reference's worker-spider URL
    shape (worker/SpiderCsrcGov.class.php:117-258): per host, S sections,
    each a 10-page ``index[_k].htm`` file series discovered ONLY through M29
    record-count pagination, each page listing ``page_size`` content pages,
    every ``att_every``-th content page carrying a PDF attachment link
    (M25) that the attachment route fetches as a binary payload (M11)."""

    n_docs: int = 16000
    n_hosts: int = 8
    page_size: int = 40        # docs per list page; 10-page series → 400/section
    body_repeat: int = 60      # filler paragraphs per content page (~6 KB)
    att_every: int = 2         # every k-th doc links a /files/a{i}.pdf
    seed: int = 42


def _routed_host(s: int, p: RoutedSiteParams) -> str:
    return f"rb{s % p.n_hosts:02d}.example.test"


ROUTED_ROUTES = ((r"/list/", "list"), (r"/content/", "detail"), (r"\.pdf$", "attachment"))


def build_routed_site(p: RoutedSiteParams) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Returns (pages, robots, seeds); deterministic in ``p``.

    Sections hold contiguous doc ranges: section s → docs
    [s*400, s*400+400) on host ``s % n_hosts`` under ``/list/s{s}/``; the
    series pages past ``index.htm`` exist only as M29-synthesized URLs, so a
    crawl that misses record-count pagination fetches <=page_size docs per
    section instead of all of them."""
    per_section = 10 * p.page_size
    n_sections = max(1, p.n_docs // per_section)
    n_docs = n_sections * per_section
    urls: list[str] = []
    hosts: list[str] = []
    ctypes: list[str] = []
    bodies: list[bytes] = []

    def add(url: str, host: str, ctype: str, body: bytes) -> None:
        urls.append(url)
        hosts.append(host)
        ctypes.append(ctype)
        bodies.append(body)

    for s in range(n_sections):
        host = _routed_host(s, p)
        base = f"http://{host}/list/s{s}"
        lo = s * per_section
        for k in range(10):
            name = "index.htm" if k == 0 else f"index_{k}.htm"
            links = "".join(
                f'<a href="/content/{i}.htm">文件{i}</a>'
                for i in range(lo + k * p.page_size, lo + (k + 1) * p.page_size)
            )
            pager = (
                f'<script>var m_nRecordCount = "{per_section}";'
                f"var m_nPageSize = {p.page_size};"
                'function t(){location.href = url+"index"+"."+"htm";}</script>'
            ) if k == 0 else ""
            add(
                f"{base}/{name}", host, "text/html",
                f"<html><head><title>列表 s{s}/{k}</title></head>"
                f"<body>{pager}{links}</body></html>".encode(),
            )
    rng = np.random.default_rng(np.uint64(p.seed) * np.uint64(2_000_003))
    pdf_pad = rng.integers(32, 127, size=4096, dtype=np.uint8).tobytes()
    for i in range(n_docs):
        host = _routed_host(i // per_section, p)
        word = _WORDS[i % len(_WORDS)]
        # filler varies per doc (real corpora do): identical boilerplate
        # would make the whole corpus one simhash near-dup flood and the
        # leg would measure the SimIndex flood path, not routed dispatch
        filler = "".join(
            f"<p>正文段落{j}：依照《条例{(i * 7 + j) % 19}》第{(i * 13 + j * 3) % 87}条"
            f"持续推进{_WORDS[(i + j) % len(_WORDS)]}{_WORDS[(i * 11 + j * 5) % len(_WORDS)]}"
            "专项治理与督查工作安排。</p>"
            for j in range(p.body_repeat)
        )
        att = (
            f'<p>附件：<a href="/files/a{i}.pdf">附件{i}</a></p>'
            if i % p.att_every == 0
            else ""
        )
        # unique 发文字号 per doc (no=1+i): repeating numbers would send most
        # of the corpus into the D4 doc_ori_no dedup + J3 near-dup gate and
        # the leg would measure the drop path instead of detail extraction
        cjk = _CJK_BODY.format(
            i=i, yy=i % 30, no=1 + i, m=1 + i % 12, d=1 + i % 28, word=word
        )
        add(
            f"http://{host}/content/{i}.htm", host, "text/html",
            f"<html><head><title>政策文件{i}_公报</title></head>"
            f"<body>{cjk}{filler}{att}</body></html>".encode(),
        )
        if i % p.att_every == 0:
            add(
                f"http://{host}/files/a{i}.pdf", host, "application/pdf",
                b"%PDF-1.4 routed-bench " + str(i).encode() + b" " + pdf_pad[: 512 + (i * 37) % 3584],
            )
    n = len(urls)
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "status": pa.array([200] * n, pa.int16()),
            "content_type": pa.array(ctypes, pa.string()),
            "body": pa.array(bodies, pa.large_binary()),
            "location": pa.array([""] * n, pa.string()),
            "fail_attempts": pa.array([0] * n, pa.int16()),
        }
    )
    robots = pa.table(
        {
            "host": pa.array([f"rb{h:02d}.example.test" for h in range(p.n_hosts)]),
            "delay_ms": pa.array([0] * p.n_hosts, pa.int32()),
            "disallow": pa.array([[]] * p.n_hosts, pa.list_(pa.string())),
        }
    )
    seeds = pa.table(
        {
            "url": pa.array([f"http://{_routed_host(s, p)}/list/s{s}/index.htm" for s in range(n_sections)]),
            "depth": pa.array([0] * n_sections, pa.int32()),
            "priority": pa.array([0] * n_sections, pa.int32()),
        }
    )
    return pages, robots, seeds


def ensure_routed_fixtures(p: RoutedSiteParams | None = None, root: str = "/tmp/lcray_fixtures") -> dict[str, str]:
    """Materialize the routed site once; returns name → parquet path (plus an
    empty images table so CrawlJob's image sink has a source to join)."""
    p = p or RoutedSiteParams()
    key = f"routed_v3_d{p.n_docs}_h{p.n_hosts}_g{p.page_size}_b{p.body_repeat}_a{p.att_every}_s{p.seed}"
    d = os.path.join(root, key)
    paths = {name: os.path.join(d, f"{name}.parquet") for name in ("pages", "robots", "seeds", "images")}
    if all(os.path.exists(v) for v in paths.values()):
        return paths
    os.makedirs(d, exist_ok=True)
    pages, robots, seeds = build_routed_site(p)
    pq.write_table(pages, paths["pages"])
    pq.write_table(robots, paths["robots"])
    pq.write_table(seeds, paths["seeds"])
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array([], pa.string()),
                "bytes": pa.array([], pa.large_binary()),
                "w": pa.array([], pa.int32()),
                "h": pa.array([], pa.int32()),
                "fmt": pa.array([], pa.string()),
                "caption": pa.array([], pa.string()),
                "phash": pa.array([], pa.int64()),
            }
        ),
        paths["images"],
    )
    return paths


# ---------------------------------------------------------------------------
# F7 — audio/video clip tables (multimodal binary columns, avcodec containers)


def build_audio_clips(n: int, seed: int = 42, sr: int = 8000) -> pa.Table:
    """Audio payload table: opaque ``bytes`` + typed metadata, one row per
    clip.  Deterministic in (n, seed, sr); decode via avcodec.decode_audio."""
    from ..functions import avcodec

    blobs = [avcodec.synth_audio(seed * 1000 + i, sr) for i in range(n)]
    return pa.table(
        {
            "clip_id": pa.array([f"au-{i:05d}" for i in range(n)], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "codec": pa.array(["aud0"] * n, pa.string()),
            "sr": pa.array([sr] * n, pa.int32()),
        }
    )


def build_video_clips(n: int, seed: int = 42, w: int = 16, h: int = 16, fps: int = 10) -> pa.Table:
    """Video payload table: opaque ``bytes`` + typed metadata, one row per
    clip.  Deterministic in (n, seed, w, h, fps)."""
    from ..functions import avcodec

    blobs = [avcodec.synth_video(seed * 1000 + i, w, h, fps) for i in range(n)]
    return pa.table(
        {
            "video_id": pa.array([f"vd-{i:05d}" for i in range(n)], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "codec": pa.array(["vid0"] * n, pa.string()),
            "fps": pa.array([fps] * n, pa.int32()),
            "w": pa.array([w] * n, pa.int32()),
            "h": pa.array([h] * n, pa.int32()),
        }
    )


def ensure_av_fixtures(
    n_audio: int = 64, n_video: int = 32, seed: int = 42, root: str = "/tmp/lcray_fixtures"
) -> dict[str, str]:
    """Materialize the audio/video clip tables once; name → parquet path.
    Also writes golden-replay truth sidecars (deterministic codec outputs as
    literal tables) powering the audio_features / video_frames oracles."""
    d = os.path.join(root, f"av2_a{n_audio}_v{n_video}_s{seed}")
    paths = {
        name: os.path.join(d, f"{name}.parquet")
        for name in ("audio", "video", "audio_truth", "video_truth")
    }
    if all(os.path.exists(v) for v in paths.values()):
        return paths
    os.makedirs(d, exist_ok=True)
    audio = build_audio_clips(n_audio, seed)
    video = build_video_clips(n_video, seed)
    pq.write_table(audio, paths["audio"])
    pq.write_table(video, paths["video"])
    from ..extras.multimodal import AudioFeatures
    from ..functions import avcodec

    pq.write_table(
        AudioFeatures()(audio.select(["clip_id", "bytes"])), paths["audio_truth"]
    )
    # video truth = decoded container metadata; the frame-SAMPLING arithmetic
    # (which frames, ts_ms) stays in the SQL oracle, not here
    nf = [
        len(avcodec.decode_video(b)[0]) for b in video.column("bytes").to_pylist()
    ]
    pq.write_table(
        pa.table({
            "video_id": video.column("video_id"),
            "n_frames": pa.array(nf, pa.int64()),
            "fps": video.column("fps"),
            "w": video.column("w"),
            "h": video.column("h"),
        }),
        paths["video_truth"],
    )
    return paths
