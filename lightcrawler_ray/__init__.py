"""lightcrawler_ray — a Ray-Data-native URL-frontier + fetch scheduler.

A from-scratch re-expression of the data-processing capabilities of the
reference crawler (liangtaohy/LightCrawler, PHP, mirrored read-only at
/root/reference) as idiomatic Ray Data pipelines:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches for every per-record transform (canonicalize / filter / extract),
- actor pools for the stateful stages (URL-seen cuckoo-filter shards,
  per-host politeness scheduling, the fetcher, simhash/phash scorers),
- explicit hash(host) partitioning for the wide steps, and
- columnar (Lance when available, Parquet otherwise) tables of
  image+caption rows as the payload store.

Nothing in here is a port: the reference is record-at-a-time PHP with a
SQL-table frontier; this engine is batch-columnar with a Dataset frontier
checkpointed per crawl round.  SURVEY.md maps every operator.
"""

__version__ = "0.1.0"
