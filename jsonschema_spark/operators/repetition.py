"""Repetition-based quality signals for training-data curation.

Mirrors the repetition filter family popularized by Gopher (Rae et
al. 2021, "Scaling Language Models", Table A1) and used in Dolma /
RedPajama-style pipelines: the fraction of a document's characters
accounted for by its most frequent word n-gram ("top n-gram"), and by
all word n-grams that occur more than once ("duplicate n-grams").
High values flag boilerplate, SEO spam, and degenerate generations.

Metric contract (documented precisely so the DuckDB oracle can mirror
it exactly):

- ``words`` = whitespace-split non-empty tokens; ``char_base`` = sum
  of word lengths (inter-word whitespace excluded).
- an n-gram's character weight is ``length(gram) - (n - 1)`` — the
  joined string minus its n-1 separator spaces, i.e. the sum of its
  word lengths.
- ``top_{n}gram_char_frac`` = ``count(g*) * chars(g*) / char_base``
  where ``g*`` is the most frequent n-gram, ties broken toward the
  lexicographically LARGEST gram (identical to ``max(struct(count,
  gram))`` in both Spark and DuckDB).
- ``dup_{n}gram_char_frac`` = ``sum over grams with count >= 2 of
  count * chars(g) / char_base``, capped at 1.0.  This counts every
  occurrence (overlapping occurrences of different grams are NOT
  span-deduplicated, unlike Dolma's char-span marking) — simpler,
  deterministic, and monotone in repetition, which is what a filter
  threshold needs.
- documents with fewer than n words score 0.0 for that n; NULL/empty
  text scores 0.0 everywhere.

Scale note: this is a ZERO-SHUFFLE operator.  Rather than exploding
n-grams and re-aggregating (a shuffle of ~len(text) x len(ns) bytes
per document — the naive distributed formulation), each document's
n-gram histogram is computed in-row: build the gram array, sort it,
and fold run-lengths with ``F.aggregate``.  One narrow projection,
JVM-side, O(G log G) per row; a 100 TB corpus pays a scan and nothing
else.  The DuckDB oracle in ``__spark_entry__.py`` uses the explode +
GROUP BY formulation — same results, independent plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_array(text: Column) -> Column:
    """Whitespace-split words with empties removed (empty array for
    NULL/blank text)."""
    words = F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+")
    return F.filter(words, lambda w: w != "")


def word_ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when len(words) < n)."""
    if n <= 1:
        return words
    starts = F.when(
        F.size(words) >= n,
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.array_join(F.slice(words, i, n), " "))


def char_base(words: Column) -> Column:
    """Sum of word lengths (the character denominator)."""
    return F.aggregate(words, F.lit(0).cast("long"),
                       lambda acc, w: acc + F.length(w))


def _run_stats(grams: Column, n: int) -> Column:
    """Fold a SORTED copy of `grams` into run-length statistics:
    struct(top_chars, dup_chars) where top_chars = best_count *
    chars(best_gram) (ties -> lexicographically largest gram, matching
    max(struct(count, gram))) and dup_chars = sum over runs >= 2 of
    run * chars(gram).  Zero shuffle: pure higher-order functions."""
    sep = n - 1

    def close_run(acc, nxt_prev, nxt_run):
        """Fold the run that just ended (acc.prev x acc.run) into
        best/dup, then open the next run."""
        run, g = acc.getField("run"), acc.getField("prev")
        gchars = F.length(g) - F.lit(sep)
        promote = (run > F.lit(0)) & (run >= acc.getField("best_c"))
        best_c = F.when(promote, run).otherwise(acc.getField("best_c"))
        best_g = F.when(promote, g).otherwise(acc.getField("best_g"))
        dup = F.when(run >= 2, acc.getField("dup") + run * gchars) \
               .otherwise(acc.getField("dup"))
        return F.struct(nxt_prev.alias("prev"), nxt_run.alias("run"),
                        best_c.alias("best_c"), best_g.alias("best_g"),
                        dup.alias("dup"))

    def step(acc, g):
        same = acc.getField("prev") == g
        grown = F.struct(
            g.alias("prev"),
            (acc.getField("run") + 1).alias("run"),
            acc.getField("best_c").alias("best_c"),
            acc.getField("best_g").alias("best_g"),
            acc.getField("dup").alias("dup"))
        return F.when(same, grown) \
                .otherwise(close_run(acc, g, F.lit(1).cast("long")))

    def finish(acc):
        closed = close_run(acc, F.lit(""), F.lit(0).cast("long"))
        best_c, best_g = closed.getField("best_c"), closed.getField("best_g")
        # best_c == 0 (no grams) -> force 0: length("") - sep is negative
        top = F.when(best_c > 0,
                     best_c * (F.length(best_g) - F.lit(sep))) \
               .otherwise(F.lit(0).cast("long"))
        return F.struct(top.alias("top_chars"),
                        closed.getField("dup").alias("dup_chars"))

    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best_c"),
                    F.lit("").alias("best_g"),
                    F.lit(0).cast("long").alias("dup"))
    return F.aggregate(F.array_sort(grams), acc0, step, finish)


def top_ngram_char_frac(text: Column, n: int) -> Column:
    """Fraction of characters in the most frequent word n-gram."""
    words = word_array(text)
    stats = _run_stats(word_ngrams(words, n), n)
    base = F.greatest(char_base(words), F.lit(1).cast("long"))
    return F.round(stats.getField("top_chars") / base, 6)


def dup_ngram_char_frac(text: Column, n: int) -> Column:
    """Occurrence-weighted fraction of characters in duplicated word
    n-grams, capped at 1.0."""
    words = word_array(text)
    stats = _run_stats(word_ngrams(words, n), n)
    base = F.greatest(char_base(words), F.lit(1).cast("long"))
    return F.round(F.least(stats.getField("dup_chars") / base, F.lit(1.0)), 6)


def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       top_ns: Sequence[int] = (2, 3, 4),
                       dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10),
                       ) -> DataFrame:
    """Per-document repetition signal frame: one row per input row with
    ``top_{n}gram_char_frac`` for each n in `top_ns` and
    ``dup_{n}gram_char_frac`` for each n in `dup_ns` (Gopher Table A1's
    repetition block).  One zero-shuffle projection; reuses a single
    word array across all n."""
    t = F.col(text_col)
    words = word_array(t)
    base = F.greatest(char_base(words), F.lit(1).cast("long"))
    cols = [F.col(id_col)]
    for n in top_ns:
        stats = _run_stats(word_ngrams(words, n), n)
        cols.append(F.round(stats.getField("top_chars") / base, 6)
                    .alias(f"top_{n}gram_char_frac"))
    for n in dup_ns:
        stats = _run_stats(word_ngrams(words, n), n)
        cols.append(
            F.round(F.least(stats.getField("dup_chars") / base, F.lit(1.0)), 6)
            .alias(f"dup_{n}gram_char_frac"))
    return df.select(*cols)


def repetition_filter(df: DataFrame, id_col: str, text_col: str,
                      max_top: dict[int, float] | None = None,
                      max_dup: dict[int, float] | None = None,
                      ) -> DataFrame:
    """Rows that PASS the repetition thresholds (Gopher defaults:
    top-2 0.20 / top-3 0.18 / top-4 0.16; dup-5..10 0.15 down to 0.10).
    `max_top` / `max_dup` map n -> max allowed fraction."""
    if max_top is None:
        max_top = {2: 0.20, 3: 0.18, 4: 0.16}
    if max_dup is None:
        max_dup = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
    t = F.col(text_col)
    keep = F.lit(True)
    for n, lim in max_top.items():
        keep = keep & (top_ngram_char_frac(t, n) <= lim)
    for n, lim in max_dup.items():
        keep = keep & (dup_ngram_char_frac(t, n) <= lim)
    return df.filter(keep)
