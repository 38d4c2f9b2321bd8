"""Sequence packing for LLM pretraining pipelines.

Pretraining consumes documents as one concatenated token stream chunked
into fixed-length sequences ("concat-and-chunk"): each document occupies
the half-open token interval [start_offset, start_offset + n_tokens) of
the stream, and chunk ``i`` covers [i*seq_len, (i+1)*seq_len).  Producing
that mapping at corpus scale needs a *global exclusive cumulative sum* of
token counts in a deterministic document order — the one window shape
naive Spark gets catastrophically wrong (an unpartitioned window funnels
100 TB through a single task).

The construction here is the scalable two-phase cumsum:

1. Derive a *bucket* from a prefix of the ordering key itself (not
   ``spark_partition_id()``, which depends on physical layout and would
   break determinism).  Keys are md5 hex, so a b-char prefix gives 16^b
   buckets and bucket order == key order.
2. Intra-bucket exclusive cumsum with a window partitioned by bucket —
   one shuffle, parallel across buckets.
3. Bucket totals (16^b rows — tiny) get their own exclusive cumsum on a
   single partition, then broadcast-join back as per-bucket offsets.

start_offset = bucket_offset + intra_bucket_cumsum: exact, deterministic
(pure function of the key order), and every step is bounded — nothing
ever funnels the full corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["exclusive_cumsum", "pack_greedy_nosplit", "pack_sequences"]


def exclusive_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    bucket_prefix_len: int = 2,
) -> DataFrame:
    """Exclusive (sum of strictly-preceding rows) cumulative sum of
    ``value_col`` in ``order_col`` order, without a global window.

    ``order_col`` must be a hex-string key whose lexicographic order is
    the intended order (md5 keys from :func:`~..splits.global_shuffle`
    qualify) and must be unique per row.  ``bucket_prefix_len`` hex chars
    define 16^n buckets (2 → 256): enough parallelism for any cluster
    while keeping the bucket-offset table broadcast-tiny."""
    bucket = F.substring(F.col(order_col), 1, bucket_prefix_len)
    b = df.withColumn("_bucket", bucket)
    intra_w = (
        W.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    intra = F.coalesce(F.sum(value_col).over(intra_w), F.lit(0).cast("long"))
    totals = b.groupBy("_bucket").agg(F.sum(value_col).cast("long").alias("_btot"))
    # 16^n rows: a single-partition window here is deliberate and bounded.
    off_w = W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_btot").over(off_w), F.lit(0).cast("long")).alias("_boff"),
    )
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, (intra + F.col("_boff")).cast("long"))
        .drop("_bucket", "_boff")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    seq_len: int,
    seed: int = 42,
    key_col: str = "pack_key",
) -> DataFrame:
    """Assign every document its token interval and chunk span in a
    concat-and-chunk packing of the corpus into ``seq_len``-token
    sequences.

    Documents are ordered by a reproducible md5 shuffle key (same
    construction as ``splits.global_shuffle`` — epoch reshuffle = new
    seed, no data movement), then given:

    - ``start_offset``: first token position in the concatenated stream;
    - ``first_chunk`` / ``last_chunk``: the sequence ids the document
      spans (a document may straddle a chunk boundary, as pretraining
      packing does);
    - ``n_chunks``: how many sequences contain a piece of it.

    Empty documents (0 tokens) get first_chunk = last_chunk = the chunk
    at their offset and n_chunks = 0.  Downstream, grouping by chunk id
    range materializes training sequences; the heavy lifting is the
    deterministic offset assignment, which is exactly what this returns.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive (got {seq_len})")
    from .splits import shuffle_key

    keyed = df.withColumn(key_col, shuffle_key(id_col, seed))
    cum = exclusive_cumsum(keyed, key_col, token_count_col, out_col="start_offset")
    n = F.col(token_count_col).cast("long")
    start = F.col("start_offset")
    first_chunk = F.floor(start / seq_len).cast("long")
    last_chunk = F.when(n > 0, F.floor((start + n - 1) / seq_len)).otherwise(
        first_chunk
    ).cast("long")
    n_chunks = F.when(n > 0, last_chunk - first_chunk + 1).otherwise(F.lit(0)).cast("long")
    return (
        cum.withColumn("first_chunk", first_chunk)
        .withColumn("last_chunk", last_chunk)
        .withColumn("n_chunks", n_chunks)
    )


def pack_greedy_nosplit(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    seq_len: int,
    num_packers: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Greedy first-fit packing where documents NEVER straddle a sequence
    boundary — the SFT-style "sample packing" (each training sequence is
    a concatenation of whole examples plus padding), as opposed to
    :func:`pack_sequences`' pretraining concat-and-chunk where documents
    may split across chunks.

    The greedy rule is inherently sequential (whether a document opens a
    new bin depends on every placement before it), so it is distributed
    the way production packers actually run: documents are hash-routed
    to ``num_packers`` independent packers (pure function of the id —
    deterministic, engine-replayable), and each packer packs ITS
    documents sequentially in md5-shuffled order inside one
    ``applyInPandas`` group. Parallelism across packers, bounded
    sequential work within (corpus/num_packers documents — size the knob
    so a group fits one task; a 100 TB corpus uses 10^5-10^6 packers).
    Bin ids are (packer, bin) pairs; no global coordination exists or is
    needed — a trainer reads any packer's bins independently.

    Rules: a document with ``n > seq_len`` tokens is truncated to
    ``seq_len`` (``n_packed``); a document fits the OPEN bin iff
    ``fill + n_packed <= seq_len``, else it opens the next bin;
    zero-token documents occupy the open bin at the current offset. The
    within-group loop is a plain Python loop over numpy arrays — the
    recurrence (a restarting cumsum) has no vectorized form, and group
    sizes are bounded by construction.

    Returns one row per document: ``id_col``, ``packer``, ``bin``,
    ``bin_offset`` (first token slot inside the bin), ``n_packed``.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive (got {seq_len})")
    if num_packers <= 0:
        raise ValueError(f"num_packers must be positive (got {num_packers})")
    import pandas as pd

    from pyspark.sql import types as T

    from .dedup import portable_hash64
    from .splits import shuffle_key

    packer = F.pmod(
        portable_hash64(F.col(id_col).cast("string")), F.lit(num_packers)
    ).cast("int")
    key = shuffle_key(id_col, seed)
    keyed = df.select(
        F.col(id_col),
        F.least(F.col(token_count_col).cast("long"), F.lit(seq_len)).alias(
            "_n_packed"
        ),
        packer.alias("packer"),
        key.alias("_k"),
    )
    id_field = [f for f in keyed.schema.fields if f.name == id_col][0]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("packer", T.IntegerType(), False),
            T.StructField("bin", T.LongType(), False),
            T.StructField("bin_offset", T.LongType(), False),
            T.StructField("n_packed", T.LongType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_k", kind="mergesort").reset_index(drop=True)
        ns = pdf["_n_packed"].to_numpy()
        bins, offs = [], []
        cur_bin, fill = 0, 0
        for n in ns:
            if fill + n > seq_len:
                cur_bin += 1
                fill = 0
            bins.append(cur_bin)
            offs.append(fill)
            fill += int(n)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "packer": pdf["packer"],
                "bin": pd.Series(bins, dtype="int64"),
                "bin_offset": pd.Series(offs, dtype="int64"),
                "n_packed": pdf["_n_packed"],
            }
        )

    return keyed.groupBy("packer").applyInPandas(pack, out_schema)
