"""Text-analysis operators over the documents table: token counting,
stopword ratio, language id, quality scoring, fingerprinting.

Each is a vectorized (or tight-python over batch) map_batches stage; the
SQL-oracled ones (token count, stopword ratio, lang id) use semantics chosen
to be expressible identically in DuckDB (split on single spaces, fixed
stopword list, substring windows) so the driver's value-hash comparison is
exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions import texttools

# fixed list shared with the SQL oracle (order irrelevant, membership exact)
STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "was", "it", "for")


def _docs(sf_dir: str, cols: list[str]) -> rd.Dataset:
    from .. import storage

    return storage.read_parquet_clean(f"{sf_dir}/documents.parquet", columns=cols)


def token_counts(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per doc (SQL: len(string_split_regex(trim, '\\s+')))."""

    def f(t: pa.Table) -> pa.Table:
        n = [len(x.split()) if x.strip() else 0 for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": pa.array(n, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def stopword_ratio(sf_dir: str) -> rd.Dataset:
    """Stopword fraction over single-space-split lowercase tokens — the
    quality-score ingredient, kept SQL-mirrorable."""
    sw = set(STOPWORDS)

    def f(t: pa.Table) -> pa.Table:
        out = []
        for x in t.column("text").to_pylist():
            toks = x.lower().split(" ")
            out.append(sum(tk in sw for tk in toks) / len(toks) if toks else 0.0)
        return pa.table({"doc_id": t.column("doc_id"), "stop_ratio": pa.array(out, pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def lang_id(sf_dir: str) -> rd.Dataset:
    """Heuristic language id (zh/en/other) on the first 2000 chars: CJK char
    ratio > 0.15 → zh; latin ratio > 0.4 AND a stopword present → en; else
    other.  Same arithmetic in the SQL oracle."""

    def f(t: pa.Table) -> pa.Table:
        out = []
        for x in t.column("text").to_pylist():
            out.append(texttools.lang_id(x))
        return pa.table({"doc_id": t.column("doc_id"), "lang_pred": pa.array(out, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> rd.Dataset:
    """Composite quality heuristic (length/punct/stopword); oracle-checked —
    the SQL mirror replays the same double ops in the same order."""

    def f(t: pa.Table) -> pa.Table:
        out = [texttools.quality_score(x) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "quality": pa.array(out, pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1, adapted token-level because the corpus is single-line): per doc
    with ≥3 tokens, the fraction of 2-gram occurrences taken by the most
    frequent 2-gram (``top2_frac``), the fraction of 2-gram occurrences whose
    gram repeats within the doc (``dup2_frac``), and the top-3-gram fraction
    (``top3_frac``).  Purely within-doc → embarrassingly parallel map_batches,
    ZERO shuffles; SQL-oracled (DuckDB builds the identical grams and the
    same integer-ratio arithmetic)."""
    from collections import Counter

    def f(t: pa.Table) -> pa.Table:
        ids, t2, d2, t3 = [], [], [], []
        for did, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = (x or "").lower().split()
            if len(toks) < 3:
                continue
            c2 = Counter(zip(toks, toks[1:]))
            c3 = Counter(zip(toks, toks[1:], toks[2:]))
            tot2, tot3 = len(toks) - 1, len(toks) - 2
            ids.append(did)
            t2.append(max(c2.values()) / tot2)
            d2.append(sum(v for v in c2.values() if v >= 2) / tot2)
            t3.append(max(c3.values()) / tot3)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "top2_frac": pa.array(t2, pa.float64()),
            "dup2_frac": pa.array(d2, pa.float64()),
            "top3_frac": pa.array(t3, pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def train_split(sf_dir: str) -> rd.Dataset:
    """Deterministic hash-based train/valid/test assignment — the
    dataset-split primitive of a training-data pipeline.  Bucket =
    md5-low64(str(doc_id)) mod 100 (little-endian low 8 digest bytes, the
    exact value DuckDB's ``md5_number_lower`` computes, so the oracle replays
    bit-for-bit): <90 train, <95 valid, else test.  Pure per-row function of
    the key → ZERO shuffles, resumable, and stable under repartitioning —
    the properties a 100 TB split must have (no sampling state, no RNG)."""
    import hashlib

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        buckets = [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:16], "little") % 100
            for i in ids
        ]
        split = ["train" if b < 90 else "valid" if b < 95 else "test" for b in buckets]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(split, pa.string()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(f, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> rd.Dataset:
    """Rolling-hash winnowing fingerprint per doc; oracle-checked — the SQL
    mirror computes each window polynomial in HUGEINT mod 2^63."""

    def f(t: pa.Table) -> pa.Table:
        out = [texttools.fingerprint(x) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "fingerprint": pa.array(out, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def decontaminate(sf_dir: str, n: int = 5) -> rd.Dataset:
    """Benchmark decontamination — flag training docs that share any token
    n-gram with the held-out eval set (the n-gram-overlap rule of GPT-3
    appendix C / PaLM §6; n scaled to the fixture's ~55-token docs).  The
    eval set here is the deterministic slice doc_id % 97 == 0.

    Scale shape: the eval set is SMALL by construction (benchmarks are
    thousands of docs, not billions) — its distinct n-gram set is built once
    and broadcast via ``ray.put``; the 100 TB training corpus then streams
    through one map_batches counting set hits per doc.  ZERO shuffles.
    SQL-oracled: DuckDB builds the same grams on both sides and joins."""
    import ray

    def grams(text: str) -> set[str]:
        toks = (text or "").lower().split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    def ev_only(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    eval_grams: set[str] = set()
    ev = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ev_only, batch_format="pyarrow")
        .to_pandas()
    )
    for x in ev["text"]:
        eval_grams |= grams(x)
    ev_ref = ray.put(frozenset(eval_grams))

    def f(t: pa.Table) -> pa.Table:
        evs = ray.get(ev_ref)
        ids, hits = [], []
        for did, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            if did % 97 == 0:
                continue
            ids.append(did)
            hits.append(len(grams(x) & evs))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array([h > 0 for h in hits], pa.bool_()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def domain_sample(sf_dir: str) -> rd.Dataset:
    """Domain-weighted deterministic sampling — the mixture-reweighting step
    of a pretraining pipeline (downsample overrepresented sources), done as
    a pure hash rule so it needs NO sampling state, NO RNG, and survives
    re-partitioning/resume: keep doc when md5-low64(doc_id) mod 10000 falls
    under the source's rate (in basis points).  Rates here are a
    deterministic function of the source index: 1000 + (idx * 421) % 9000.
    Pure per-row predicate → ZERO shuffles; SQL-oracled bit-exact via
    DuckDB's md5_number_lower."""
    import hashlib

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        keep_ids, keep_src, keep_bp = [], [], []
        for did, s in zip(ids, srcs):
            rate = 1000 + (int(s[3:]) * 421) % 9000
            h = int.from_bytes(hashlib.md5(str(did).encode()).digest()[8:16], "little") % 10000
            if h < rate:
                keep_ids.append(did)
                keep_src.append(s)
                keep_bp.append(rate)
        return pa.table({
            "doc_id": pa.array(keep_ids, pa.int64()),
            "source": pa.array(keep_src, pa.string()),
            "rate_bp": pa.array(keep_bp, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(f, batch_format="pyarrow")


def vocab_topk(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Corpus vocabulary — the tokenizer-training prep step: term frequency
    and document frequency per whitespace token, top-k by tf (ties: term
    asc).

    Scale shape — partial aggregation before the shuffle: each batch emits
    ONE (term, tf, df) row per distinct term it contains (a Counter over
    the batch plus a per-doc set for df), so the groupby moves
    vocabulary-sized partials, never token instances; the merged table is
    bounded by |vocab|, and only that bounded table is sorted/limited on
    the driver.  SQL-oracled (unnest + group + window, identical split)."""
    from collections import Counter

    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        tf: Counter = Counter()
        df: Counter = Counter()
        for x in t.column("text").to_pylist():
            toks = (x or "").lower().split()
            tf.update(toks)
            df.update(set(toks))
        terms = sorted(tf)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "tf": pa.array([tf[w] for w in terms], pa.int64()),
            "df": pa.array([df[w] for w in terms], pa.int64()),
        })

    merged = (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf"), Sum("df"))
        .to_pandas()  # |vocab| rows — bounded by the language, not the data
        .rename(columns={"sum(tf)": "tf", "sum(df)": "df"})
    )
    merged = merged.sort_values(["tf", "term"], ascending=[False, True], kind="stable")
    return merged.head(k).reset_index(drop=True)[["term", "tf", "df"]]


def tfidf_topk(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Per-document top-k terms by tf·idf (idf = ln(N/df); ties: term asc)
    — the relevance-feature step of a retrieval/quality pipeline.

    Scale shape — the document frequency table is VOCABULARY-sized, so it
    is aggregated once (the same bounded partial-df path as
    ``vocab_topk``), broadcast via ``ray.put``, and the corpus then streams
    through ONE map_batches that scores and ranks within each doc locally
    — zero shuffles over the corpus itself.  For an unbounded vocabulary
    the broadcast side would first prune to terms above a min-df floor.
    SQL-oracled (same integer tf/df/N inputs → bit-identical doubles)."""
    import math
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    def partial_df(t: pa.Table) -> pa.Table:
        df: Counter = Counter()
        n = 0
        for x in t.column("text").to_pylist():
            df.update(set((x or "").lower().split()))
            n += 1
        terms = sorted(df)
        return pa.table({
            "term": pa.array(terms + ["\x00docs"], pa.string()),
            "df": pa.array([df[w] for w in terms] + [n], pa.int64()),
        })

    merged = (
        _docs(sf_dir, ["text"])
        .map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df"))
        .to_pandas()
    )
    df_map = dict(zip(merged["term"], merged["sum(df)"]))
    n_docs = int(df_map.pop("\x00docs"))
    df_ref = ray.put((df_map, n_docs))

    def score(t: pa.Table) -> pa.Table:
        dfm, n = ray.get(df_ref)
        ids, terms, scores, ranks = [], [], [], []
        for did, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            tf = Counter((x or "").lower().split())
            scored = sorted(
                ((w, c * math.log(n / dfm[w])) for w, c in tf.items()),
                key=lambda p: (-p[1], p[0]),
            )[:k]
            for r, (w, s) in enumerate(scored, 1):
                ids.append(did)
                terms.append(w)
                scores.append(s)
                ranks.append(r)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "score": pa.array(scores, pa.float64()),
            "rank": pa.array(ranks, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


def unigram_logprob(sf_dir: str) -> rd.Dataset:
    """Per-document mean negative log-probability under the corpus unigram
    LM — the CCNet-style language-model quality score (Wenzek et al. 2020
    use a KenLM 5-gram; the unigram LM is the same pipeline shape with the
    model swapped).  p(w) = tf_w / T over the whole corpus.

    Scale shape — identical to ``tfidf_topk``: the LM table is
    vocabulary-bounded, aggregated once from per-batch partials, broadcast
    via ``ray.put``; the corpus then streams through one scoring
    map_batches, zero shuffles.  SQL-oracled (same doubles; summation-order
    float drift is ~1e-12 on ~100-token docs, far inside the compare's
    rounding)."""
    import math
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    def partial_tf(t: pa.Table) -> pa.Table:
        tf: Counter = Counter()
        for x in t.column("text").to_pylist():
            tf.update((x or "").lower().split())
        terms = sorted(tf)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "tf": pa.array([tf[w] for w in terms], pa.int64()),
        })

    merged = (
        _docs(sf_dir, ["text"])
        .map_batches(partial_tf, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf"))
        .to_pandas()
    )
    tf_map = dict(zip(merged["term"], (int(v) for v in merged["sum(tf)"])))
    total = sum(tf_map.values())
    lm_ref = ray.put((tf_map, total))

    def score(t: pa.Table) -> pa.Table:
        tfm, tot = ray.get(lm_ref)
        ids, scores, ns = [], [], []
        for did, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = (x or "").lower().split()
            if not toks:
                continue
            s = sum(-math.log(tfm[w] / tot) for w in toks)
            ids.append(did)
            scores.append(s / len(toks))
            ns.append(len(toks))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "nll": pa.array(scores, pa.float64()),
            "n_tokens": pa.array(ns, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


def corpus_mix(sf_dir: str) -> rd.Dataset:
    """Per-(lang, source) mixture profile — document count and total chars,
    the table a pretraining run reports before/after reweighting.  Native
    multi-key Ray Data groupby over exact integer sums (no float drift);
    the shuffle key space is |langs| × |sources|, tiny at any corpus size
    once per-batch combining has run."""
    from ray.data.aggregate import Count, Sum

    def rename(t: pa.Table) -> pa.Table:
        names = [
            {"count()": "n_docs", "sum(n_chars)": "total_chars"}.get(c, c)
            for c in t.column_names
        ]
        return t.rename_columns(names)

    return (
        _docs(sf_dir, ["lang", "source", "n_chars"])
        .groupby(["lang", "source"])
        .aggregate(Count(), Sum("n_chars"))
        .map_batches(rename, batch_format="pyarrow")
    )


# --- PII scan / redaction -------------------------------------------------

# RE2-compatible patterns, identical semantics in Python re and DuckDB
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """PII detection + redaction counts per document — the scrubbing pass a
    training corpus needs before release.  The scanner (count emails / IPv4s
    / phone numbers, report the redacted length after replacing each class
    with ``<PII>`` in a fixed order) is general; because the synthetic corpus
    is PII-free, each doc is first augmented with a deterministic contact
    footer (a pure function of doc_id, mirroring a crawled page footer) so
    the scan has observable positives.  The oracle rebuilds the same footer
    and replays the same RE2 patterns in the same substitution order —
    exact.  Embarrassingly parallel map_batches: zero shuffles; regexes
    compile once per worker at module import."""
    import re

    re_email, re_ipv4, re_phone = re.compile(PII_EMAIL), re.compile(PII_IPV4), re.compile(PII_PHONE)

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        n_em, n_ip, n_ph, rlen = [], [], [], []
        for did, x in zip(ids, t.column("text").to_pylist()):
            s = f"{x} contact u{did}@ex.com ip 10.0.{did % 256}.{did % 100} tel 555-{did % 10000:04d}"
            n_em.append(len(re_email.findall(s)))
            n_ip.append(len(re_ipv4.findall(s)))
            n_ph.append(len(re_phone.findall(s)))
            s = re_phone.sub("<PII>", re_ipv4.sub("<PII>", re_email.sub("<PII>", s)))
            rlen.append(len(s))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_email": pa.array(n_em, pa.int64()),
            "n_ipv4": pa.array(n_ip, pa.int64()),
            "n_phone": pa.array(n_ph, pa.int64()),
            "red_len": pa.array(rlen, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# --- end-to-end curation funnel ------------------------------------------


def curate_corpus(sf_dir: str, min_chars: int = 200, prefix: int = 40) -> pd.DataFrame:
    """The flagship curation funnel composed end to end: length gate →
    language gate (en/zh) → exact dedup (keep-first on a text-prefix key),
    reported as per-stage retention counts — the audit artifact every
    curation run ships with.

    ONE linear pipeline, ONE shuffle: a map_batches pass computes the two
    gate flags and the dedup key per row; the groupby(key) aggregates
    count / gate-sums / gated-indicator per key; a second map_batches
    partial collapses the grouped table so the driver sees O(blocks) rows,
    never O(keys).  Stage counts fall out of the same grouped result —
    nothing is read or shuffled twice."""
    from ray.data.aggregate import Count, Max, Sum

    ds = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    def flags(t: pa.Table) -> pa.Table:
        n = t.column("n_chars").to_numpy(zero_copy_only=False)
        lang = t.column("lang").to_pylist()
        f1 = (n >= min_chars).astype(np.int64)
        f2 = f1 * np.array([1 if l in ("en", "zh") else 0 for l in lang], np.int64)
        key = [x[:prefix] for x in t.column("text").to_pylist()]
        return pa.table({
            "key": pa.array(key), "f1": pa.array(f1), "f2": pa.array(f2),
        })

    grouped = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Count(alias_name="cnt"), Sum("f1", alias_name="s1"),
            Sum("f2", alias_name="s2"), Max("f2", alias_name="kept"),
        )
    )

    def collapse(t: pa.Table) -> pa.Table:
        return pa.table({
            "total": pa.array([int(pc.sum(t["cnt"]).as_py() or 0)], pa.int64()),
            "n_f1": pa.array([int(pc.sum(t["s1"]).as_py() or 0)], pa.int64()),
            "n_f2": pa.array([int(pc.sum(t["s2"]).as_py() or 0)], pa.int64()),
            "n_kept": pa.array([int(pc.sum(t["kept"]).as_py() or 0)], pa.int64()),
        })

    part = grouped.map_batches(collapse, batch_format="pyarrow").to_pandas()
    tot = part.sum()
    return pd.DataFrame({
        "stage": ["total", "len_gate", "lang_gate", "dedup"],
        "n_docs": np.array([tot.total, tot.n_f1, tot.n_f2, tot.n_kept], np.int64),
    })


# RE2-compatible BPE-style pre-tokenizer (GPT-2 shape minus lookaheads,
# which RE2 lacks): contraction suffixes, space-prefixed words / numbers /
# punctuation runs
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"


def bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """Token counting under a BPE-ish regex pre-tokenizer (the GPT-2 split
    classes, RE2-compatible) — the cost-estimation pass of a training-data
    pipeline.  Embarrassingly parallel map_batches; the oracle replays the
    identical pattern through DuckDB's RE2."""
    import re

    pat = re.compile(BPE_PATTERN)

    def f(t: pa.Table) -> pa.Table:
        n = [len(pat.findall(x)) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "n_bpe_tokens": pa.array(n, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def pmi_collocations(sf_dir: str, min_count: int = 5, k: int = 50) -> pd.DataFrame:
    """Top-k bigram collocations by pointwise mutual information
    (Church & Hanks 1990) — the phrase-mining step of corpus analysis:
    PMI(w1, w2) = ln(P(w1 w2) / (P(w1) P(w2))) with bigram probability over
    total bigram count B and unigram probabilities over total token count
    U, restricted to bigrams seen >= ``min_count`` times (rare-pair PMI is
    noise).  Ties at equal PMI break (w1, w2) ascending.

    Scale shape — ONE corpus pass emits per-batch partial unigram AND
    bigram counts into a single (w1, w2) keyed table (unigrams ride with
    w2 = '' — a token the whitespace tokenizer can never produce), so the
    only corpus-sized work is the streaming count; the shuffle moves
    vocabulary-sized partials.  The merged table is materialized ONCE at
    |vocab| + |bigram vocab| rows (bounded, ≪ corpus; the same bound
    vocab_topk already relies on), unigram counts broadcast via ``ray.put``
    as a dict, and the PMI scoring streams over the bigram rows with the
    k-cut done by sort+limit on the filtered (>= min_count) survivors.
    The float op order ln(c12/B*U/c1*U/c2) is mirrored literally in the
    SQL oracle, so the doubles agree."""
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        uc: Counter = Counter()
        bc: Counter = Counter()
        for x in t.column("text").to_pylist():
            toks = (x or "").lower().split()
            uc.update(toks)
            bc.update(zip(toks, toks[1:]))
        w1 = list(uc.keys()) + [a for a, _ in bc.keys()]
        w2 = [""] * len(uc) + [b for _, b in bc.keys()]
        cnt = list(uc.values()) + list(bc.values())
        return pa.table({
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    merged = (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()  # |vocab| + |bigram vocab| rows — bounded, not corpus
    )
    uni = merged.map_batches(
        lambda t: t.filter(pc.equal(t["w2"], "")), batch_format="pyarrow"
    ).to_pandas()  # vocab-sized
    u_counts = dict(zip(uni["w1"], uni["cnt"].astype(int)))
    u_total = int(uni["cnt"].sum())
    # bigram total = everything that isn't a unigram row — one tiny aggregate
    b_total = int(merged.aggregate(Sum("cnt", alias_name="s"))["s"]) - u_total
    u_ref = ray.put(u_counts)

    def score(t: pa.Table) -> pa.Table:
        uc = ray.get(u_ref)
        keep = pc.and_(
            pc.not_equal(t["w2"], ""), pc.greater_equal(t["cnt"], min_count)
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({
                "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                "c12": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64()),
            })
        w1 = t.column("w1").to_pylist()
        w2 = t.column("w2").to_pylist()
        c12 = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = np.fromiter((uc[w] for w in w1), np.int64, len(w1))
        c2 = np.fromiter((uc[w] for w in w2), np.int64, len(w2))
        pmi = np.log(c12.astype(np.float64) / b_total * u_total / c1 * u_total / c2)
        return pa.table({
            "w1": pa.array(w1, pa.string()), "w2": pa.array(w2, pa.string()),
            "c12": pa.array(c12), "pmi": pa.array(pmi, pa.float64()),
        })

    return (
        merged.map_batches(score, batch_format="pyarrow")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )


def char_entropy(sf_dir: str) -> rd.Dataset:
    """Per-document character-level Shannon entropy — the classic
    low-entropy gate for gibberish, filler and binary-junk docs (natural
    text sits ~3.5-4.5 bits/char; repeated-filler spam collapses toward 0;
    the same heuristic family as ``quality_scores``/``repetition_stats``).

    Purely within-doc → embarrassingly parallel map_batches, ZERO shuffles.
    Vectorized per BATCH, not per doc: each doc's codepoints come from one
    ``encode("utf-32-le")`` → ``np.frombuffer`` view (no per-char Python),
    per-(doc, char) counts are ONE ``np.unique`` over packed
    ``doc_idx << 32 | codepoint`` int64 keys for the whole batch, and the
    entropy reduction is a segmented ``np.add.reduceat``.

    SQL-oracled: DuckDB splits the identical codepoints
    (``string_split_regex(text, '')``), the counts are exact ints, and both
    sides sum the same ``-(k/n)·log2(k/n)`` doubles (summation-order noise
    is ~1e-15, far under the comparator's 1e-9).
    """

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cps = [np.frombuffer((x or "").encode("utf-32-le"), dtype=np.uint32)
               for x in t.column("text").to_pylist()]
        lens = np.array([c.size for c in cps], dtype=np.int64)
        n_distinct = np.zeros(len(ids), dtype=np.int64)
        entropy = np.zeros(len(ids), dtype=np.float64)
        if lens.sum():
            idx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            keys = (idx << 32) | np.concatenate(cps).astype(np.int64)
            uk, cnt = np.unique(keys, return_counts=True)
            udoc = (uk >> 32).astype(np.int64)
            p = cnt.astype(np.float64) / lens[udoc].astype(np.float64)
            terms = -p * np.log2(p)
            starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
            present = udoc[starts]
            n_distinct[present] = np.diff(np.r_[starts, udoc.size])
            entropy[present] = np.add.reduceat(terms, starts)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_cps": pa.array(lens),
            "n_distinct": pa.array(n_distinct),
            "entropy": pa.array(entropy),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def sentence_stats(sf_dir: str) -> rd.Dataset:
    """Per-document sentence segmentation stats — the length-profile gate a
    text-curation pipeline runs next to ``quality_scores``: sentence count,
    total/max sentence length (codepoints) and mean length per doc (docs
    whose sentences are all near-empty or enormous are extraction junk).

    Purely within-doc → map_batches, ZERO shuffles, and fully vectorized:
    ONE ``pc.split_pattern_regex`` per batch (RE2, same engine DuckDB
    uses), Arrow-level trim/length, then segmented counts/sums/maxes via
    ``np.bincount``/``np.maximum.reduceat`` over the repeat-generated
    (already-sorted) parent indices — no per-doc Python.  Integer-exact
    except the final total/count division, which both sides compute as the
    same two-int double divide.  SQL-oracled (string_split_regex + trim +
    group + left join keeps empty-sentence docs)."""

    def f(t: pa.Table) -> pa.Table:
        nd = len(t)
        pieces = pc.split_pattern_regex(t.column("text"), pattern="[.!?]+")
        counts = pc.list_value_length(pieces).fill_null(0)
        counts = counts.to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(nd, dtype=np.int64), counts)
        flat = pc.list_flatten(pieces)
        trimmed = pc.utf8_trim(flat, characters=" \t\n\r")
        clens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = clens > 0
        parent, clens = parent[keep], clens[keep]
        n = np.bincount(parent, minlength=nd).astype(np.int64)
        tot = np.bincount(parent, weights=clens, minlength=nd).astype(np.int64)
        mx = np.zeros(nd, np.int64)
        if parent.size:
            starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
            mx[parent[starts]] = np.maximum.reduceat(clens, starts)
        avg = np.where(n > 0, tot / np.maximum(n, 1), 0.0)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_sents": pa.array(n),
            "total_sent_chars": pa.array(tot),
            "max_sent_chars": pa.array(mx),
            "avg_sent_chars": pa.array(avg, pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def zipf_fit(sf_dir: str, top_ranks: int = 256) -> pd.DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS of ln(frequency)
    against ln(rank) for the top ``top_ranks`` terms — the slope (~−1 for
    natural language) is the corpus-health check tokenizer training runs
    first; a flat slope means boilerplate/templated text, a cliff means
    spam flooding a few tokens.

    Scale shape: identical to ``vocab_topk`` — per-batch term-frequency
    partials (one row per distinct term per batch) before ONE
    vocabulary-sized groupby; only the |vocab| merged table is sorted and
    only ``top_ranks`` rows feed the fit, so the driver never sees
    anything data-sized.  Fit from the five OLS sufficient sums; the oracle
    replays the identical ranked-log sums in SQL (summation-order noise
    ~1e-15, far under the comparator's 1e-6)."""
    from collections import Counter

    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        tf: Counter = Counter()
        for x in t.column("text").to_pylist():
            tf.update((x or "").lower().split())
        terms = sorted(tf)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "tf": pa.array([tf[w] for w in terms], pa.int64()),
        })

    merged = (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term").aggregate(_Sum("tf", alias_name="tf"))
        .to_pandas()  # |vocab| rows — bounded by the language, not the data
        .sort_values(["tf", "term"], ascending=[False, True], kind="stable")
        .head(top_ranks)
    )
    n = float(len(merged))
    x = np.log(np.arange(1, len(merged) + 1, dtype=np.float64))
    y = np.log(merged["tf"].to_numpy(np.float64))
    sx, sy = float(x.sum()), float(y.sum())
    sxy, sxx, syy = float((x * y).sum()), float((x * x).sum()), float((y * y).sum())
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r2 = 1.0 if den == 0 else (n * sxy - sx * sy) * (n * sxy - sx * sy) / den
    return pd.DataFrame([{"n_ranks": len(merged), "slope": slope,
                          "intercept": intercept, "r2": r2}])
