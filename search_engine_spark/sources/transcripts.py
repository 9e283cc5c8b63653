"""Transcript sources and adapters.

The engine's canonical input (BASELINE.json input_hint) is a table of
multi-turn conversation / agent transcripts:

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp)

A reference "page" corresponds to one turn:

- ``url``   <-> ``conv_id || '#' || turn_idx``  (the unique doc key;
  reference urlToPage map, memory-storage.ts:38-42)
- ``title`` <-> ``role || ':' || coalesce(tool, '')``
- ``rank``  <-> stable global turn order
  ``row_number() over (order by conv_id, turn_idx)``

:func:`corpus_from_transcripts` converts transcripts to the engine's
*corpus* shape ``(url, title, text, ...order cols)``; the index builder
operates on a corpus so that reference-parity fixtures (which carry
explicit titles/urls/ranks) use the same code path.

:func:`synthesize_transcripts` builds a deterministic transcripts table
from the driver-provided ``documents.parquet`` (TESTDATA.md) — no external
data, fully seeded by doc_id arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TRANSCRIPT_ORDER = ("conv_id", "turn_idx")


def is_wellformed(text_col, url_col) -> "F.Column":
    """Reference bulk-ingest skip rule (demo.ts:118-122), over corpus
    columns: a row is malformed when text is null/empty, the doc key is
    null/empty, text contains ``|``, or text starts with ``]``. Returns
    the KEEP condition so callers can also count skips via ~cond."""
    return (
        text_col.isNotNull()
        & (F.length(text_col) > 0)
        & url_col.isNotNull()
        & (F.length(url_col) > 0)
        & ~text_col.contains("|")
        & ~text_col.startswith("]")
    )


def corpus_from_transcripts(
    transcripts: DataFrame, malformed_filter: bool = True
) -> DataFrame:
    """Map transcript turns to the engine's corpus shape.

    Keeps the transcript sort keys so doc-id assignment can use the stable
    total order (input_hint: per-turn text equality under stable
    (conv_id, turn_idx) ordering).

    ``malformed_filter`` replicates the reference's ingest skip rule
    (demo.ts:118-122) — on by default, as in the reference demo driver.
    """
    if malformed_filter:
        transcripts = transcripts.filter(
            is_wellformed(F.col("text"), F.col("conv_id"))
        )
    return transcripts.select(
        F.concat_ws("#", F.col("conv_id"), F.col("turn_idx")).alias("url"),
        F.concat_ws(
            ":", F.col("role"), F.coalesce(F.col("tool"), F.lit(""))
        ).alias("title"),
        F.col("text"),
        "conv_id",
        "turn_idx",
        "ts",
    )


def synthesize_transcripts(
    spark: SparkSession,
    documents_path: str,
    turns_per_conv: int = 8,
    words_per_turn: int = 40,
    replicate: int = 1,
    tail_vocab: int = 0,
    tail_stride: int = 1,
) -> DataFrame:
    """Deterministically expand ``documents.parquet`` rows into multi-turn
    transcripts. Pure column arithmetic (no randomness, no driver loops):

    - each document becomes one turn; conversations group
      ``turns_per_conv`` consecutive doc_ids
    - turn text = a word-window of the document text (keeps per-turn text
      equality trivially checkable against the source)
    - role cycles user/assistant/tool; tool set on tool turns
    - ts = fixed epoch + doc_id minutes (deterministic)
    - ``tail_vocab`` (default 0 = off, output byte-identical to before
      the knob existed): when > 0, append one term ``tail_<k>`` per turn
      with ``k = floor(tail_vocab / (1 + doc_id % tail_vocab))`` — term
      ``tail_k`` then lands in ~``tail_vocab/(k(k+1))`` of the turns, a
      deterministic heavy-tailed (Zipf-like, exponent ~2) document
      frequency distribution. The base documents vocabulary is ~50
      uniformly-hot terms, which is worst-case for block-max pruning
      (every block is near-max for every term); the tail gives the
      realistic df skew that WAND-style bounds exploit, without any
      external data or randomness.
    - ``tail_stride`` (default 1 = byte-identical to the plain
      tail_vocab output): when > 1, the tail rank is computed from
      ``doc_id DIV stride`` instead of ``doc_id``, so runs of
      ``stride`` consecutive source docs share one tail term —
      deterministic TOPICAL LOCALITY, the ingest-order clustering real
      transcript corpora show (a topic burst arrives as consecutive
      events). Combined with an event-time-ordered build
      (``order_cols=("ts", ...)``) a tail term's postings then occupy
      narrow doc-id ranges, the structure doc-range block bounds
      (Block-Max WAND) exploit; with uniform residue spreading
      (stride=1) every term's blocks span the whole doc space and
      range-aware pruning is structurally starved regardless of df.
    """
    docs = spark.read.parquet(documents_path)
    if replicate > 1:
        # deterministic corpus scale-up for throughput benchmarks: each
        # replica is a distinct conversation namespace. The source is often
        # a single small file (one scan partition) — spread it first so the
        # explode fans out across the cluster instead of one task.
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        ).withColumn(
            "doc_id",
            (F.col("rep").cast("long") * (1 << 33)) + F.col("doc_id"),
        )
    words = F.split(F.col("text"), " ")
    turn_text = F.concat_ws(
        " ", F.slice(words, 1, words_per_turn)
    )
    if tail_vocab > 0:
        key = (
            F.col("doc_id") if tail_stride <= 1
            else F.floor(F.col("doc_id") / F.lit(tail_stride))
        )
        tail_rank = F.floor(
            F.lit(tail_vocab) / (F.lit(1) + key % tail_vocab)
        )
        turn_text = F.concat_ws(
            " ", turn_text, F.concat(F.lit("tail_"), tail_rank)
        )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("conv-"), (F.col("doc_id") / turns_per_conv).cast("long")).alias(
            "conv_id"
        ),
        (F.col("doc_id") % turns_per_conv).cast("int").alias("turn_idx"),
        role.alias("role"),
        turn_text.alias("text"),
        F.when(role == "tool", F.concat(F.lit("tool_"), F.col("source"))).alias(
            "tool"
        ),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=(F.col("doc_id") % 1000000).cast("int"))
        ).alias("ts"),
    )
