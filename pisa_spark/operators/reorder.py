"""Document-ID reordering (reference tools/reorder_docids.cpp, SURVEY §2.6).

DocID assignment order controls gap sizes and therefore compressed index
size. Methods (reorder_docids.hpp:130-292, docs/src/guide/reordering.md):

- by URL: the default in plans/build.py (dense_ids over url) — the cheap,
  large win for webtext; recursive graph bisection's own paper notes URL
  ordering captures most of the benefit.
- random (seeded): orderBy a seeded hash — the control/baseline.
- custom mapping: join a (doc_id -> new_doc_id) table.

reorder_index rebuilds an existing index under a new permutation by
decoding postings, renumbering, and re-encoding — the Spark equivalent of
permuting the uncompressed index in place.
"""

from __future__ import annotations

from pisa_spark.config import IndexConfig
from pisa_spark.operators.postings import decode_postings, encode_postings


def random_mapping(docs, seed: int = 42):
    """(doc_id, new_doc_id): a seeded random permutation of the docID space
    (reorder_docids.hpp random strategy)."""
    from pisa_spark.plans.build import dense_ids
    from pyspark.sql import functions as F

    keyed = docs.select(
        "doc_id",
        F.xxhash64(F.concat_ws(":", F.lit(str(seed)),
                               F.col("doc_id").cast("string"))).alias("_rk"))
    out, cache = dense_ids(keyed, "_rk", "new_doc_id")
    return out.select("doc_id", "new_doc_id")


def url_mapping(docs):
    """(doc_id, new_doc_id) ordered by url (reordering.md:46-66)."""
    from pisa_spark.plans.build import dense_ids

    out, cache = dense_ids(docs.select("doc_id", "url"), "url", "new_doc_id")
    return out.select("doc_id", "new_doc_id")


def reorder_index(index, mapping, cfg: IndexConfig | None = None):
    """Rebuild index tables under a (doc_id -> new_doc_id) permutation."""
    from pyspark.sql import functions as F

    cfg = cfg or index.cfg
    flat = decode_postings(index.postings, cfg)
    docs2 = (
        index.docs.join(mapping, "doc_id")
        .select(F.col("new_doc_id").alias("doc_id"), "url", "doc_len")
        .withColumn("shard_id",
                    (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long"))
    )
    tf2 = (
        flat.join(mapping, "doc_id")
        .select("term_id", F.col("new_doc_id").alias("doc_id"), "tf")
        .join(docs2.select("doc_id", "doc_len"), "doc_id")
    )
    postings2 = encode_postings(tf2, cfg, index.stats)
    shards2 = (
        docs2.groupBy("shard_id")
        .agg(F.array_sort(
            F.collect_list(F.struct("doc_id", "doc_len"))).alias("dl"))
        .select("shard_id",
                (F.col("shard_id") * cfg.shard_span).alias("base_doc"),
                F.transform("dl", lambda x: x["doc_len"]).alias("doc_lens"))
    )
    from pisa_spark.plans.build import InvertedIndex

    return InvertedIndex(docs=docs2, lexicon=index.lexicon,
                         postings=postings2.persist(), shards=shards2.persist(),
                         stats=index.stats, cfg=cfg)


def compressed_size(index):
    """Total encoded posting bytes — the objective reordering minimizes
    (evaluate_collection_ordering analogue)."""
    from pyspark.sql import functions as F

    return index.postings.agg(
        (F.sum(F.length("docs_bin")) + F.sum(F.length("tfs_bin")))
        .alias("bytes")).collect()[0]["bytes"]
