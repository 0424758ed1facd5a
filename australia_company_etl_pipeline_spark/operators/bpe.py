"""Byte-pair-encoding tokenizer: distributed counting, real BPE merges.

Upgrades the profile queries' BPE-ish *upper bound*
(``textstats.bpe_ish_token_count``, a pre-tokenization unit count) to an
actual trained subword tokenizer:

- ``word_counts``  — the distributed pass: pre-tokenize (the same
  ``\\w+|[^\\w\\s]`` unit split the profile uses), explode, ONE
  partial-aggregated shuffle on the unit. Hot words collapse map-side,
  so the reducer sees one row per distinct word regardless of corpus
  size — this is the only part that touches the 100 TB corpus.
- ``train_bpe``    — classic merge-table learning on the BOUNDED
  word-frequency table (``max_words`` keeps the driver transfer at a
  few MB). The merge loop is inherently sequential (merge i+1 depends
  on merge i), and every production trainer runs it on exactly this
  aggregated word→count dict (HuggingFace tokenizers, SentencePiece
  BPE); the distributed work IS the counting. Deterministic: ties on
  pair frequency break lexicographically.
- ``encode``       — Arrow-batched ``pandas_udf`` applying the learned
  ranks with the standard greedy lowest-rank-first loop (the GPT-2
  ``bpe()`` shape), one Python crossing per projection, per-batch word
  cache so repeated words (most of any corpus) pay the loop once.

Encoding is lossless by construction (no end-of-word marker; merges are
word-internal): concatenating a word's tokens reproduces the word, so
``decode`` is ``array_join``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# the same pre-tokenization split as textstats.bpe_ish_token_count:
# word-character runs and single non-space symbols. The split is done
# JVM-side (regexp_extract_all) in BOTH training and encoding — Java and
# Python disagree on \w membership (combining marks and join controls
# are word chars under Java's (?U) but not Python's re), so splitting
# with Python in the encoder would learn merges over units the encoder
# never forms for Indic/Arabic/decomposed-accent text.
_UNIT_PATTERN = r"(?U)\w+|[^\w\s]"


def _units(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(_UNIT_PATTERN), 0)


def word_counts(df: DataFrame, text_col: str,
                max_words: int | None = 50_000) -> DataFrame:
    """Distributed ``(word, n)`` frequency table over the pre-tokenized
    units, ordered (n desc, word asc). ``max_words`` cuts via
    ``orderBy().limit()`` — a distributed TakeOrdered, no global sort —
    bounding what ``train_bpe`` pulls to the driver. The tail it drops
    is the frequency-singleton fringe that could never win a merge
    against the head's mass anyway."""
    units = df.select(F.explode(_units(F.col(text_col))).alias("word"))
    out = (units.groupBy("word")
           .agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.desc("n"), F.asc("word")))
    return out.limit(max_words) if max_words else out


def train_bpe(df: DataFrame, text_col: str, n_merges: int = 200,
              min_pair_count: int = 2,
              max_words: int | None = 50_000) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge table from a corpus.

    One distributed job (the word count), then the sequential merge loop
    on the collected ≤``max_words`` rows. Stops early when no adjacent
    symbol pair reaches ``min_pair_count``. Returns merges in rank order
    — the model artifact ``encode`` consumes."""
    counts = [(r["word"], r["n"])
              for r in word_counts(df, text_col, max_words).collect()]
    words: dict[tuple[str, ...], int] = {}
    for w, n in counts:
        sym = tuple(w)
        words[sym] = words.get(sym, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # deterministic argmax: highest count, then lexicographic pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + n
        words = nxt
    return merges


def _bpe_word(word: str, ranks: dict[tuple[str, str], int],
              cache: dict[str, list[str]]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (the GPT-2 bpe loop)."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    sym = list(word)
    while len(sym) > 1:
        pairs = {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        out, i = [], 0
        while i < len(sym):
            if (i < len(sym) - 1 and sym[i] == best[0]
                    and sym[i + 1] == best[1]):
                out.append(best[0] + best[1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    cache[word] = sym
    return sym


def encode(text: Column, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens for a text column — the
    pre-tokenization split runs JVM-side (the SAME Java regex the
    trainer counted with — see ``_UNIT_PATTERN``), then ONE Arrow
    crossing applies the merge ranks per unit; the rank table ships once
    in the udf closure (a few KB per executor, the broadcast-variable
    shape without the ceremony) and the per-batch word cache makes
    repeated words O(1)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(units: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(us):
            if us is None:
                return None
            out: list[str] = []
            for unit in us:
                out.extend(_bpe_word(unit, ranks, cache))
            return out

        return units.map(run)

    return _enc(_units(text))


def token_count(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Trained-tokenizer token count — the budget number sequence packing
    and context-window planning actually need (the native
    ``bpe_ish_token_count`` stays the cheap no-model upper bound)."""
    return F.size(encode(text, merges))


def fertility_stats(df: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    group_col: str = "lang") -> DataFrame:
    """Per-group tokenizer fertility: (group, n_docs, bpe_tokens,
    ws_tokens, chars, tokens_per_word, chars_per_token).

    Fertility (tokens per whitespace word) is the number that says a
    tokenizer is mis-fit for a slice of the corpus — a language at
    ≫1.5× the corpus average is underrepresented in the merge table and
    will cost that much more context window and compute per sentence.
    chars_per_token is the compression view of the same thing.

    One projection (the Arrow-batched encoder is the only non-native
    step, same as ``encode``) + ONE partial-aggregated shuffle on the
    group key; ratios are derived from the sums, rounded to the 1e-6
    grid. NULL text counts as 0 everywhere.
    """
    from .textstats import tokens as _ws_tokens

    base = df.select(
        F.col(group_col),
        F.when(F.col(text_col).isNotNull(),
               token_count(F.col(text_col), merges).cast("long"))
        .otherwise(F.lit(0)).alias("__bpe"),
        F.when(F.col(text_col).isNotNull(),
               F.size(_ws_tokens(F.col(text_col))).cast("long"))
        .otherwise(F.lit(0)).alias("__ws"),
        F.coalesce(F.length(text_col), F.lit(0)).cast("long")
        .alias("__ch"))
    agg = (base.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("__bpe").alias("bpe_tokens"),
                F.sum("__ws").alias("ws_tokens"),
                F.sum("__ch").alias("chars")))
    return agg.select(
        group_col, "n_docs", "bpe_tokens", "ws_tokens", "chars",
        F.when(F.col("ws_tokens") > 0,
               F.round(F.col("bpe_tokens").cast("double")
                       / F.col("ws_tokens"), 6)).alias("tokens_per_word"),
        F.when(F.col("bpe_tokens") > 0,
               F.round(F.col("chars").cast("double")
                       / F.col("bpe_tokens"), 6)).alias("chars_per_token"))


def decode(tokens: Column) -> Column:
    """Inverse of ``encode`` up to the pre-tokenization unit boundaries:
    merges are word-internal, so concatenation restores each unit's
    text (whitespace between units is not preserved — same contract as
    any whitespace-normalizing tokenizer round-trip)."""
    return F.array_join(tokens, "")
