"""Incremental (streaming) MinHash-LSH near-dup dedup — the production
shape for continuously-ingesting corpus pipelines (VERDICT r9 #7: the
last LLM-pipeline component with no streaming twin; every prior
streaming query re-aggregates counters, whereas near-dup dedup needs a
persistent BAND INDEX that outlives any window).

Design:
- **Signatures are map-side** (no stream-side shuffle before the
  stateful operator): the per-doc word-3-gram shingle array, two seeded
  md5s per shingle, and the 8 chunk-minima are all higher-order-function
  expressions over one row — the exact same hash family as the batch
  ``operators.dedup.minhash_signatures`` (min over exploded rows ≡
  array_min over the same values), so batch and stream agree
  bit-for-bit. The md5 arrays are materialized as real columns before
  the chunk-min transforms reference them — interpreted HOF lambdas
  don't CSE, and inlining would re-hash every shingle 4× (the r9
  changepoint lesson).
- **State is one long per (band, signature) bucket**: the min doc id
  ever seen in that bucket. A new doc collides iff its bucket already
  has a keeper; collisions emit one drop event per (doc, band). State
  grows with DISTINCT band signatures — the same bound the batch LSH
  self-join shuffles — never with throughput.
- **Greedy first-seen semantics, exactly**: a doc is dropped iff some
  bucket of its contains a smaller-id doc (bucket-min rule). This is
  deliberately NOT the batch ``dedup_near_keep_first`` transitive-
  component rule: a stream cannot retroactively drop an already-emitted
  keeper when a later doc bridges two clusters, so the honest streaming
  contract is the greedy one — keeps are a SUPERSET of the transitive
  keeps (both keep every component's min; greedy additionally keeps
  members only transitively connected to it). The bucket-min rule is
  order-free and exactly SQL-expressible, so the oracle gate is a hash
  gate, not an approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DROP_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("sig", StringType()),
        StructField("doc_id", LongType()),
        StructField("keeper_id", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("keeper", LongType())])


def band_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 2,
    rows_per_band: int = 4,
    k: int = 3,
) -> DataFrame:
    """Map-side (band, sig) rows per doc — the streaming-safe twin of
    ``word_shingles → minhash_signatures → lsh band stack`` (same md5
    hash family, same band composition; min over a per-row array instead
    of a groupBy, so no shuffle touches the stream). Docs shorter than k
    words produce no shingles and therefore no band rows (they can never
    collide), matching the batch pipeline's empty-group behavior."""
    w = F.col("w")
    shingles = F.when(
        F.size(w) >= k,
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - k),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.element_at(w, (i + j + 1).cast("int"))
                        for j in range(k)
                    ],
                ),
            ),
            lambda s: F.length(s) > 0,
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_md5 = (n_hashes + 3) // 4

    # loop variables are captured via factory functions, NOT lambda
    # default args: a two-parameter lambda makes F.transform pass the
    # ELEMENT INDEX as the second argument, silently clobbering the
    # captured seed/chunk number
    def _seeded(s: int):
        return F.transform(
            F.col("sh"), lambda x: F.md5(F.concat(F.lit(f"{s}|"), x))
        ).alias(f"h{s}")

    def _chunk_min(h: int):
        return F.array_min(
            F.transform(
                F.col(f"h{h // 4}"),
                lambda x: F.substring(x, (h % 4) * 8 + 1, 8),
            )
        ).alias(f"mh{h}")

    hashed = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("w"),
        )
        .select("doc_id", shingles.alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc_id", *[_seeded(s) for s in range(n_md5)])
    )
    mh = [_chunk_min(h) for h in range(n_hashes)]
    sigs = hashed.select("doc_id", *mh)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            f"mh{b * rows_per_band + r}"
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(
        "doc_id", F.explode(band_structs).alias("bs")
    ).select(F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"), "doc_id")


def streaming_lsh_drops(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stateful band index: GroupState per (band, sig) holds the bucket
    keeper (min id first seen); every later doc touching the bucket emits
    a drop event. Downstream, ``drops.select('doc_id').distinct()`` is
    the drop set and the kept corpus is the source minus it."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        if not ids:
            return
        ids.sort()
        (keeper,) = state.get if state.exists else (None,)
        if keeper is None:
            keeper, ids = ids[0], ids[1:]
        state.update((keeper,))
        if ids:
            yield pd.DataFrame(
                {
                    "band": [int(key[0])] * len(ids),
                    "sig": [key[1]] * len(ids),
                    "doc_id": ids,
                    "keeper_id": [keeper] * len(ids),
                }
            )

    keyed = band_signatures(stream, id_col=id_col, text_col=text_col)
    return keyed.groupBy("band", "sig").applyInPandasWithState(
        update,
        outputStructType=DROP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
