"""docs table build: dedup (unique-key upsert) + dense doc_id + sha256 invariant.

Reference semantics covered:
- unique-key identity / upsert (E9): the reference resolves documents by the
  schema uniqueKey (BulkUpdateHandler.java:34,91). Our key is (repo, path);
  latest ``commit`` wins — a window row_number, never a driver loop.
- stored-field retention (S3 "store raw XML" analog, XsltUpdateHandler.java:
  156-189): ``content`` is kept as a column and its sha256 recorded, giving
  the per-row invariant vs the source table required by BASELINE.json.

doc_id contract (SURVEY.md §7.0): dense int64 = global rank in the total
order (repo, path, commit) over the deduplicated corpus — deterministic for a
given input regardless of partitioning.

Scale note: a naive ``row_number() over (order by ...)`` collapses to ONE
partition. We instead range-partition on the key, rank locally, and add
per-partition offsets (two cheap passes) — the standard scalable dense-id
pattern; works unchanged at 10^12 rows since the only driver-side state is
one count per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest_commit(corpus: DataFrame) -> DataFrame:
    """E9 unique-key upsert: keep the lexicographically-max commit per (repo, path)."""
    w = Window.partitionBy("repo", "path").orderBy(
        F.col("commit").desc(), F.col("content").desc()
    )
    return (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assign_doc_ids(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Add dense deterministic ``doc_id`` = rank in total order (repo,path,commit)."""
    if num_partitions is None:
        num_partitions = corpus.sparkSession.sparkContext.defaultParallelism
    ranged = corpus.repartitionByRange(num_partitions, "repo", "path", "commit")
    w = Window.partitionBy("_pid").orderBy("repo", "path", "commit")
    local = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lrn", F.row_number().over(w)
    )
    local = local.persist()
    counts = {r["_pid"]: r["cnt"] for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = corpus.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.col("_off") + F.col("_lrn") - 1).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )
    return out


def build_docs(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """corpus → docs(doc_id, repo, path, commit, lang, content, content_sha256).

    **Skinny-key plan**: dedup (E9) and dense-rank assignment both run over
    (repo, path, commit) keys only — ``content`` bytes are NEVER shuffled (at
    10^12 files the content column is ~the whole corpus; shuffling it twice
    for id assignment was the build's dominant serial cost). The ranked key
    table then joins back to the corpus on the unique key.

    Exact-duplicate (repo, path, commit) rows (possible only in malformed
    inputs — commits are content hashes) are resolved deterministically by
    max(content), detected with a cheap count comparison first.

    ``doc_len`` is attached later by the postings build (it is defined as the
    post-analysis token count, so it falls out of tokenization — one pass).
    """
    spark = corpus.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    # (repo, path, commit) is assumed unique (commits are content hashes);
    # a malformed input with exact-duplicate keys yields duplicate doc_ids
    # after the join, which the segment builder rejects loudly (doc_id
    # uniqueness assert) — checking upfront would cost two full corpus passes.
    keys = corpus.select("repo", "path", "commit")

    # E9 upsert on keys only: latest commit per (repo, path). PERSIST the
    # skinny result: the dense-rank assignment needs two more passes over it
    # (range-partitioner sampling + per-partition counts) and each pass would
    # otherwise recompute the SOURCE scan — expensive when the source is a
    # generator/UDF or a non-pruning format. Keys are 3 short strings/row
    # (MEMORY_AND_DISK spills fine; at petabyte scale this is the standard
    # skinny-side cache, ~1e-4 of corpus bytes).
    from pyspark import StorageLevel

    latest = (
        keys.groupBy("repo", "path")
        .agg(F.max("commit").alias("commit"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # dense rank on the skinny key table
    ranked = assign_doc_ids(latest, num_partitions)  # (repo, path, commit, doc_id)
    # single wide pass: join ids onto the corpus (content moves once, into
    # the join — hash-partitioned by the unique key, no sort of content)
    docs = corpus.join(ranked, ["repo", "path", "commit"])
    return docs.withColumn("content_sha256", F.sha2(F.col("content"), 256)).select(
        "doc_id", "repo", "path", "commit", "lang", "content", "content_sha256"
    )
