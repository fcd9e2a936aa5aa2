"""Sequence packing: assign documents to fixed-token-budget bins (the
pretraining "context packing" step — concatenating short documents into
max_seq_len windows so padding doesn't waste compute).

The packing rule is deterministic NEXT-FIT over a deterministic order:
docs are sharded by the portable hash of their id, ordered within the
shard by (hash, id), and appended to the shard's current bin until the
next doc would exceed ``cap_tokens``; then a new bin starts. Next-fit
(not first-fit/best-fit) because it is the rule a one-pass streaming
packer actually implements, it needs O(1) state, and — unlike
first-fit — it is replayable in ANSI SQL (a recursive scan), so the
assignment is certifiable cross-engine and reproducible bit-for-bit
across runs and cluster sizes.

Scale shape:
  - Shards are INDEPENDENT: one shuffle to co-locate each shard's
    (id, n_tokens) rows, then a sequential fold per shard. With
    ``n_shards`` ~ 10-100× the cluster's cores, each shard holds
    corpus/n_shards rows; the fold sees only two small columns, never
    the text. The output is (id, shard, bin, n_tokens) — a metadata
    frame joined back to content by the caller when materializing
    packed sequences (broadcast or co-partitioned join on id).
  - Docs LONGER than the cap get a bin of their own and a
    ``truncated`` flag (the caller decides split-vs-drop); they must
    not poison the fold by wedging the current bin forever.
  - applyInPandas materializes one shard's (id, n_tokens) rows at a
    time — at 10^12 docs with n_shards = 10^5, a shard is ~10^7 tiny
    rows, comfortably in executor memory BECAUSE the fold input is
    projected to the two packing columns first.

Determinism note: the shard hash and in-shard order are pure functions
of the doc id (portable md5 — sampling.hash_bucket), so a retry/rerun
repacks identically; no monotonically_increasing_id anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def pack_next_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    cap_tokens: int = 2048,
    n_shards: int = 16,
    salt: str = ":pack",
) -> DataFrame:
    """Deterministic next-fit packing. Returns (id_col, shard, bin,
    n_tokens, truncated): ``bin`` numbers bins per shard from 0 in fold
    order; ``truncated`` marks docs whose own token count exceeds the
    cap (alone in their bin). Null ids (no hash → no deterministic
    shard) and null/negative token counts fail the job with a
    ValueError raised FROM THE FOLD (surfacing as PythonException) —
    validated in-stream, not by a separate pre-scan of the input.

    ``tokens_col`` is the TOKENIZER SEAM: either a numeric count or a
    precomputed token ARRAY (e.g. BPE pieces from an upstream
    tokenizer), in which case its size is the budget unit — the engine
    never imposes its whitespace tokenization on callers that carry
    real tokenizer output. A null array is a null count (fails the
    in-fold validation like any null count).
    """
    from pyspark.sql.types import ArrayType

    if cap_tokens <= 0:
        raise ValueError(f"cap_tokens must be positive, got {cap_tokens}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    tok = F.col(tokens_col)
    if isinstance(df.schema[tokens_col].dataType, ArrayType):
        # size() returns -1 for null arrays pre-ANSI; keep nulls null so
        # the fold's null check (not the negative check) names the issue
        tok = F.when(tok.isNotNull(), F.size(tok))
    slim = df.select(
        F.col(id_col),
        tok.cast("bigint").alias("n_tokens"),
        hash_bucket(id_col, salt=salt).alias("__h"),
    ).withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))

    out_schema = (
        f"{id_col} {slim.schema[id_col].dataType.simpleString()}, "
        "shard int, bin bigint, n_tokens bigint, truncated boolean"
    )
    cap = int(cap_tokens)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # validation lives IN the fold: a driver-side pre-scan would
        # cost a second full pass over clean inputs just to find
        # nothing (review r5 #7). Null ids hash to a null shard and
        # still reach a fold group; null/negative counts surface here.
        if pdf[id_col].isna().any():
            raise ValueError(
                f"pack_next_fit requires non-null {id_col}: a null id has "
                f"no hash, so its shard and fold position are undefined"
            )
        if pdf["n_tokens"].isna().any() or (pdf["n_tokens"] < 0).any():
            raise ValueError(
                f"pack_next_fit requires non-null, non-negative {tokens_col}: "
                f"packing over unknown lengths is meaningless"
            )
        pdf = pdf.sort_values(["__h", id_col], kind="mergesort").reset_index(drop=True)
        bins, truncs = [], []
        cur_bin, cur_fill = 0, 0
        started = False
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > cap:
                # oversize doc: own bin, flagged; fold state resets
                if started:
                    cur_bin += 1
                bins.append(cur_bin)
                truncs.append(True)
                cur_bin += 1
                cur_fill, started = 0, False
                continue
            if started and cur_fill + n > cap:
                cur_bin += 1
                cur_fill = 0
            bins.append(cur_bin)
            truncs.append(False)
            cur_fill += n
            started = True
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["truncated"] = pd.Series(truncs, dtype="bool")
        return pdf[[id_col, "shard", "bin", "n_tokens", "truncated"]]

    return slim.groupBy("shard").applyInPandas(fold, out_schema)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    stride: int = 256,
    tokens_col: str | None = None,
    joiner: str = " ",
) -> DataFrame:
    """Context-window chunking with overlap — the complement of packing
    for documents LONGER than the window: slide a ``chunk_tokens``
    window over the single-space token stream in steps of ``stride``
    (stride < chunk_tokens ⇒ overlapping chunks, the standard training/
    retrieval chunking shape).

    Chunk k (0-based) covers 1-based token positions
    [k·stride + 1, k·stride + chunk_tokens], clipped at the document
    end; the number of chunks is 1 for docs of ≤ chunk_tokens tokens,
    else 1 + ceil((n − chunk_tokens)/stride) — so every token is
    covered and the final chunk always reaches the last token. NULL
    text yields no rows (chunking a null doc is vacuous; filter/repair
    upstream if nulls matter).

    Returns (id_col, chunk_index, n_chunk_tokens, chunk_text). Pure
    Catalyst expressions (sequence/transform/slice/array_join +
    explode) — one scan, a narrow per-row fan-out, zero shuffle; the
    per-doc chunk count is bounded by n/stride so the explode is
    linear in corpus tokens, and DuckDB replays the identical slices
    (generate_series + inclusive list slicing).

    TOKENIZER SEAM: pass ``tokens_col`` naming a precomputed
    array<string> column (BPE/SentencePiece pieces, character n-grams,
    …) and chunk boundaries follow THOSE tokens — ``text_col`` is then
    ignored and nullness is judged on the array. ``joiner`` is the
    detokenizer: how chunk_text reassembles pieces (" " for word
    tokens, "" for character-level/BPE-with-markers). The single-space
    split stays the certified default; real mixing pipelines budget
    tokenizer units, and this seam accepts them without shipping a
    tokenizer."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 < stride <= chunk_tokens):
        raise ValueError(
            f"stride must be in (0, chunk_tokens], got {stride} (chunk {chunk_tokens})"
        )
    from ..functions.text import tokens

    if tokens_col is not None:
        t = F.col(tokens_col)
        null_gate = F.col(tokens_col).isNotNull()
    else:
        t = tokens(text_col)  # THE single-space tokenization helper —
        # one definition shared with token_count/corpus stats so chunk
        # boundaries can never desynchronize from the token identity
        null_gate = F.col(text_col).isNotNull()
    n = F.size(t)
    extra = F.when(
        n > chunk_tokens,
        F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(stride)).cast("int"),
    ).otherwise(F.lit(0))
    ks = F.sequence(F.lit(0), extra)
    chunks = F.transform(
        ks,
        lambda k: F.struct(
            k.cast("int").alias("chunk_index"),
            F.least(n - k * F.lit(stride), F.lit(chunk_tokens))
            .cast("int")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(t, k * F.lit(stride) + 1, F.lit(chunk_tokens)), joiner
            ).alias("chunk_text"),
        ),
    )
    return (
        docs.filter(null_gate)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_index").alias("chunk_index"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )
