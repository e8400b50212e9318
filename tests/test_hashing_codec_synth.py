"""Tests for hashing, the deterministic image codec, and synthetic fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from lightcrawler_ray.functions import hashing, imagecodec
from lightcrawler_ray.sources import synth


class TestHashing:
    def test_doc_id_squash(self):
        assert hashing.doc_id("a b\nc　d") == hashing.doc_id("abcd")

    def test_simhash_similarity(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = a + " extra tail token"
        c = "совершенно другой текст про другие вещи вообще"
        ha, hb, hc = (hashing.simhash64(t) for t in (a, b, c))
        d_ab = hashing.hamming64(np.array([ha]), np.array([hb]))[0]
        d_ac = hashing.hamming64(np.array([ha]), np.array([hc]))[0]
        assert d_ab < d_ac
        assert d_ab <= 12

    def test_simhash_bands_pigeonhole(self):
        sig = np.array([0x0123456789ABCDEF], dtype=np.uint64)
        bands = hashing.simhash_bands(sig, 4)
        assert bands.shape == (1, 4)
        assert bands[0, 0] == 0xCDEF and bands[0, 3] == 0x0123

    def test_minhash_jaccard_estimate(self):
        a_, b_ = hashing.minhash_params(128)
        t1 = "one two three four five six seven eight nine ten " * 3
        t2 = "one two three four five six seven XXX YYY ZZZ " * 3
        s1 = hashing.minhash_signature(hashing.shingle_hashes(t1), a_, b_)
        s2 = hashing.minhash_signature(hashing.shingle_hashes(t2), a_, b_)
        est = (s1 == s2).mean()
        assert 0.1 < est < 0.9  # overlapping but not identical

    def test_phash_near_dup_vs_different(self):
        px = synth._gen_pixels(5, 42)
        lossy = imagecodec.decode(imagecodec.encode(px, "jpeg"))
        other = synth._gen_pixels(6, 42)
        h0 = hashing.phash64(px)
        h1 = hashing.phash64(lossy)
        h2 = hashing.phash64(other)
        d01 = hashing.hamming64(np.array([h0]).astype(np.int64).view(np.uint64),
                                np.array([h1]).astype(np.int64).view(np.uint64))[0]
        d02 = hashing.hamming64(np.array([h0]).astype(np.int64).view(np.uint64),
                                np.array([h2]).astype(np.int64).view(np.uint64))[0]
        assert d01 <= 4
        assert d02 > 10

    def test_dhash_near_dup_vs_different(self):
        px = synth._gen_pixels(5, 42)
        lossy = imagecodec.decode(imagecodec.encode(px, "jpeg"))
        other = synth._gen_pixels(6, 42)
        h0 = hashing.dhash64(px)
        h1 = hashing.dhash64(lossy)
        h2 = hashing.dhash64(other)
        d01 = hashing.hamming64(np.array([h0]).astype(np.int64).view(np.uint64),
                                np.array([h1]).astype(np.int64).view(np.uint64))[0]
        d02 = hashing.hamming64(np.array([h0]).astype(np.int64).view(np.uint64),
                                np.array([h2]).astype(np.int64).view(np.uint64))[0]
        assert d01 <= 4
        assert d02 > 10
        assert -(1 << 63) <= h0 < (1 << 63)

    def test_hist16_exact_integer_binning(self):
        px = synth._gen_pixels(7, 42)
        h = hashing.hist16(px)
        assert h.sum() == px.shape[0] * px.shape[1]
        lum = (px[:, :, 0].astype(np.int64) * 299
               + px[:, :, 1].astype(np.int64) * 587
               + px[:, :, 2].astype(np.int64) * 114) // 1000
        ref = np.bincount((lum >> 4).ravel(), minlength=16)
        assert (h == ref).all()
        # order-independent merge: two halves sum to the whole
        top, bot = px[: px.shape[0] // 2], px[px.shape[0] // 2:]
        assert (hashing.hist16(top) + hashing.hist16(bot) == h).all()


class TestCodec:
    @pytest.mark.parametrize("fmt", ["png", "bmp"])
    def test_lossless_roundtrip(self, fmt):
        px = synth._gen_pixels(1, 42)
        assert np.array_equal(imagecodec.decode(imagecodec.encode(px, fmt)), px)

    def test_jpeg_psnr_over_40(self):
        px = synth._gen_pixels(2, 42)
        out = imagecodec.decode(imagecodec.encode(px, "jpeg"))
        assert imagecodec.psnr(px, out) >= 40.0

    def test_deterministic(self):
        px = synth._gen_pixels(3, 42)
        assert imagecodec.encode(px, "jpeg") == imagecodec.encode(px, "jpeg")

    def test_bad_magic(self):
        with pytest.raises(imagecodec.CodecError):
            imagecodec.decode(b"\x89PNG not really")


class TestSynth:
    def test_images_table(self):
        t = synth.build_images(210, seed=42)
        assert t.num_rows == 210
        assert t.column("image_id")[0].as_py() == "img-00000000"
        # exact dup rows: same bytes as predecessor
        blobs = t.column("bytes").to_pylist()
        assert blobs[102] == blobs[101]
        # near dup rows: phash within 4 bits of predecessor
        ph = np.array(t.column("phash").to_pylist(), dtype=np.int64).view(np.uint64)
        assert hashing.hamming64(ph[98:99], ph[97:98])[0] <= 4

    def test_hostgraph_deterministic_and_resolvable(self):
        p = synth.GraphParams(n_pages=200, n_hosts=5, n_images=50)
        imgs = synth.build_images(p.n_images, p.seed)
        pages1, robots = synth.build_hostgraph(p, imgs)
        pages2, _ = synth.build_hostgraph(p, imgs)
        assert pages1.equals(pages2)
        urlset = set(pages1.column("url").to_pylist())
        for links in pages1.column("links").to_pylist():
            for l in links:
                assert l in urlset, l
        assert robots.num_rows == p.n_hosts + 1

    def test_seeds_canonicalize_to_real_pages(self):
        from lightcrawler_ray.functions import urltools as ut

        p = synth.GraphParams(n_pages=200, n_hosts=5, n_images=50)
        seeds = synth.build_seeds(p)
        imgs = synth.build_images(10, p.seed)
        pages, _ = synth.build_hostgraph(p, imgs)
        urlset = set(pages.column("url").to_pylist())
        for u in seeds.column("url").to_pylist():
            assert ut.canonicalize(u) in urlset

    def test_ensure_fixtures_cached(self, tmp_path):
        p = synth.GraphParams(n_pages=60, n_hosts=3, n_images=20)
        paths = synth.ensure_fixtures(p, root=str(tmp_path))
        import os

        assert all(os.path.exists(v) for v in paths.values())
        again = synth.ensure_fixtures(p, root=str(tmp_path))
        assert paths == again
