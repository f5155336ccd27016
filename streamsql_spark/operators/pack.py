"""Sequence packing for LLM training pipelines.

After filtering/dedup, a pretraining pipeline packs variable-length
documents into fixed-token-budget training sequences.  Two operators:

- :func:`budget_shard_pack` — deterministic streaming pack: documents
  in a stable order are assigned to consecutive packs by cumulative
  token count (a document starts the pack its running prefix falls in).
  One window cumsum = ONE shuffle on the partition key; the assignment
  is a pure function of (order, token counts) so it is reproducible
  across runs/cluster layouts and SQL-expressible (the DuckDB oracle
  runs the same window cumsum).

- :func:`greedy_bin_pack` — first-fit-decreasing bin packing inside
  each partition (the tighter packing used when sequence slots must
  not overflow: FFD wastes ≤ ~22% in the worst case, near-zero on
  natural length distributions).  Sequential by nature, so it runs as
  an Arrow-batched ``applyInPandas`` per partition key — each group is
  one Python pass, O(n log n) sort + O(n·bins_open) placement; at
  100 TB parallelism comes from the partition key (source/shard), not
  from intra-group threading.

Both keep documents whole (no splitting) — the variant that slices
overflow documents across packs is a trivial follow-on map and would
break the SQL oracle's row identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import ensure_parallelism


def budget_shard_pack(df: DataFrame, part_col: str, order_col: str,
                      token_col: str, budget: int,
                      pack_col: str = "pack_id") -> DataFrame:
    """Assign each document to a pack by cumulative token budget.

    ``pack_id = floor(prefix_tokens / budget)`` where ``prefix_tokens``
    is the running token total of all PRIOR documents in
    ``order_col`` order within ``part_col`` — i.e. a document joins
    the pack its start offset lands in.  Also emits
    ``pack_offset`` (the document's token start inside its pack).

    Plan shape: one Exchange on ``part_col`` + one window sort — the
    minimum any order-dependent packing can do.  Packs are only
    well-defined given an ordering, so the shuffle is inherent, not
    incidental.
    """
    df = ensure_parallelism(df)
    w = (Window.partitionBy(part_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prefix = (F.sum(F.col(token_col)).over(w) - F.col(token_col))
    return (df
            .withColumn("__prefix__", prefix.cast("bigint"))
            .withColumn(pack_col,
                        (F.col("__prefix__") / budget).cast("bigint"))
            .withColumn("pack_offset",
                        (F.col("__prefix__") % budget).cast("bigint"))
            .drop("__prefix__"))


def materialize_packs(df: DataFrame, part_col: str, order_col: str,
                      text_col: str = "text",
                      pack_col: str = "pack_id",
                      id_col: str = "doc_id",
                      sep: str = "\n\n") -> DataFrame:
    """Materialize :func:`budget_shard_pack` assignments into training
    sequences: one row per pack with the concatenated text (documents
    joined by ``sep`` in ``order_col`` order) and the document
    BOUNDARY metadata a loss-masking/attention-reset trainer needs —
    ``doc_ids`` and ``doc_offsets`` (each document's token start within
    the pack, from ``pack_offset``).

    One groupBy on (part, pack) — the pack id was assigned by a window
    over the same partition key, so with the window's ordering intact
    this aggregation reuses the exchange (no second corpus shuffle).
    Arrays are built with ``sort_array`` over (order, value) structs,
    so the concatenation order is the PACKING order, deterministic
    under any physical layout.
    """
    return (df.groupBy(part_col, pack_col)
            .agg(F.expr(
                f"array_join(transform(sort_array(collect_list("
                f"struct({order_col} AS o, {text_col} AS t))), "
                f"x -> x.t), '{sep}')").alias("pack_text"),
                F.expr(
                f"transform(sort_array(collect_list(struct("
                f"{order_col} AS o, {id_col} AS d))), x -> x.d)")
                .alias("doc_ids"),
                F.expr(
                f"transform(sort_array(collect_list(struct("
                f"{order_col} AS o, pack_offset AS po))), x -> x.po)")
                .alias("doc_offsets"),
                F.count(F.lit(1)).alias("n_docs")))


def hash_split(df: DataFrame, key_col: str,
               weights: dict[str, float],
               out_col: str = "split",
               salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a
    pure function of ``md5(salt || key)`` against cumulative weight
    thresholds — layout-independent, reproducible across runs and
    engines, zero shuffle (the same hash-rate machinery as the
    samplers in ``operators/sample.py``).

    ``weights``: e.g. ``{"train": 0.98, "val": 0.01, "test": 0.01}``
    (must sum to ~1).  A document's assignment never changes when the
    corpus grows — the property that keeps eval sets stable across
    dataset versions.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    # uniform u in [0, 1) from the top 28 bits of md5 (engine-exact,
    # no 64-bit signedness pitfalls)
    u = (F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.lit("\x1f"),
                                           F.col(key_col).cast("string"))),
                            1, 7), 16, 10).cast("double")
         / F.lit(float(16 ** 7)))
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    # thresholds walk the SORTED names so assignment is independent of
    # dict insertion order
    return df.withColumn(out_col, expr)


def chunk_documents(df: DataFrame, text_col: str = "text",
                    chunk_tokens: int = 64,
                    overlap_tokens: int = 16) -> DataFrame:
    """Split documents into overlapping fixed-token chunks (the
    sliding-window chunking step of retrieval indexes and
    long-document training prep).  Tokens are whitespace words here;
    a real tokenizer changes the split expression, not the topology.

    Chunk starts stride ``chunk_tokens − overlap_tokens`` through the
    word array; the final chunk may be short (no padding).  Emits one
    row per chunk: ``chunk_id``, ``chunk_start`` (1-based token
    offset), ``chunk_n_tokens``, ``chunk_digest`` (md5 of the chunk
    text — engine-checkable without hauling the strings).

    Pure Catalyst ``sequence``/``explode``/``slice`` — per-document
    fan-out, zero shuffle, scan-bound at any corpus size.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap must be smaller than the chunk size")
    stride = chunk_tokens - overlap_tokens
    df = ensure_parallelism(df)
    w = f"split({text_col}, ' ')"
    starts = (f"sequence(1, greatest(size({w}) - {overlap_tokens}, 1), "
              f"{stride})")
    return (df
            .withColumn("chunk_start", F.explode(F.expr(starts)))
            .withColumn("chunk_id",
                        ((F.col("chunk_start") - 1) / stride).cast("bigint"))
            .withColumn("chunk_n_tokens", F.expr(
                f"size(slice({w}, chunk_start, {chunk_tokens}))"))
            .withColumn("chunk_digest", F.expr(
                f"md5(array_join(slice({w}, chunk_start, {chunk_tokens}),"
                f" ' '))")))


def ffd_assign(tokens: list[int], ids: list, budget: int) -> tuple[list[int], list[int]]:
    """First-fit-decreasing core: place items (sorted by descending
    token count, ties by ascending id) into the first open bin with
    room; an oversize item opens its own bin.  Returns (assignment per
    input position, fill per bin).  Pure function — property-tested
    directly, and the per-group kernel of :func:`greedy_bin_pack`."""
    order = sorted(range(len(tokens)),
                   key=lambda i: (-int(tokens[i]), ids[i]))
    fills: list[int] = []
    assign = [0] * len(tokens)
    for i in order:
        t = int(tokens[i])
        for b, fill in enumerate(fills):
            if fill + t <= budget:
                assign[i] = b
                fills[b] = fill + t
                break
        else:
            assign[i] = len(fills)
            fills.append(t)
    return assign, fills


def greedy_bin_pack(df: DataFrame, part_col: str, token_col: str,
                    id_col: str, budget: int,
                    pack_col: str = "pack_id") -> DataFrame:
    """First-fit-decreasing bin packing per ``part_col`` group.

    Documents are sorted by descending token count (ties broken by
    ``id_col`` so the result is deterministic) and each is placed in
    the first open pack with room; a document larger than ``budget``
    gets a singleton pack.  Output adds ``pack_col`` and
    ``pack_tokens`` (the filled size of the document's pack).

    Pack ids are local to the group; globally unique ids are
    ``(part_col, pack_id)`` — deliberate, so no cross-group
    coordination (and no second shuffle) is needed.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    df = ensure_parallelism(df)
    # fresh StructType: StructType.add mutates in place, and df.schema
    # is the DataFrame's cached instance — extending it directly would
    # corrupt the input plan's resolved schema
    schema = StructType(list(df.schema.fields)
                        + [StructField(pack_col, LongType()),
                           StructField("pack_tokens", LongType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        assign, fills = ffd_assign(pdf[token_col].tolist(),
                                   pdf[id_col].tolist(), budget)
        out = pdf.copy()
        out[pack_col] = assign
        out["pack_tokens"] = [fills[b] for b in assign]
        return out

    return df.groupBy(part_col).applyInPandas(pack, schema=schema)
