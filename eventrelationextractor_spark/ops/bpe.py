"""Distributed BPE merge learning over a corpus (Sennrich et al. 2016).

Tokenizer training is the one corpus-scale job every LLM data pipeline
runs besides dedup/filtering. The classical algorithm is sequential
(k merge steps, each depending on the last), but its per-step work —
counting adjacent symbol pairs — is a pure corpus aggregation, which is
exactly what Spark parallelizes. No counterpart in /root/reference.

Scale design (100 TB):
* Step 0 collapses the corpus to the WORD-FREQUENCY table (one shuffle).
  Everything after is proportional to |vocab| (~10M rows for web text),
  not corpus size — the same trick SentencePiece/fastBPE use in RAM, done
  here as a distributed table so a 10^9-type vocab still fits.
* Each merge step = one map-side pair explode + one partial-agg groupBy +
  a LIMIT-1 ordered collect (a single driver row — the algorithm's
  inherent sync point; the merge decision IS driver state, like kmeans
  centroids in ops/cluster.py), then a map-side literal replace.
* Words are encoded as wrapper-delimited symbol strings
  ``<h><e><l><l><o>``: because every symbol carries both wrappers,
  a literal (non-regex) replace of ``<a><b>`` -> ``<ab>`` can neither
  match inside a longer symbol nor chain across overlapping occurrences,
  so one left-to-right pass reproduces classical BPE merge semantics
  exactly — and ``replace()`` has identical semantics in Spark and
  DuckDB, which the SQL oracle leans on.
* localCheckpoint per merge truncates the lineage (the CC-loop lesson,
  spark/kg.py:80-95) — vocab-sized, cheap.

Tie-breaks: max pair frequency, then (left, right) ascending binary —
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq) over the normalized corpus (same tokenization as
    ops/textstats token ops: lowercase, alnum runs)."""
    return (df.select(F.explode(
                F.split(normalized_text(F.col(text_col)), " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))


def _symbolized(words: DataFrame) -> DataFrame:
    return words.select(
        F.regexp_replace("w", "(.)", "<$1>").alias("sym"), "freq")


def _pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies of the symbolized vocab, weighted by
    word frequency. Pure codegen: split + transform + explode + one
    map-side-combinable groupBy."""
    arr = F.split(F.regexp_replace("sym", "^<|>$", ""), "><")
    pairs = F.expr(
        "CASE WHEN size(la) < 2 THEN array() "
        "ELSE transform(sequence(1, size(la)-1), "
        "i -> struct(element_at(la, i) AS l, element_at(la, i+1) AS r)) "
        "END")
    return (sym.withColumn("la", arr)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("f")))


def learn_bpe(df: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> list:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, pair_freq), ...]`` with rank starting at 1.
    Stops early if no pair remains."""
    sym = _symbolized(word_frequencies(df, text_col)).localCheckpoint()
    merges = []
    for rank in range(1, n_merges + 1):
        best = (_pair_counts(sym)
                .orderBy(F.desc("f"), "l", "r")
                .limit(1).collect())
        if not best:
            break
        l, r, f = best[0].l, best[0].r, best[0].f
        merges.append((rank, l, r, int(f)))
        sym = sym.select(
            F.replace("sym", F.lit(f"<{l}><{r}>"),
                      F.lit(f"<{l}{r}>")).alias("sym"),
            "freq").localCheckpoint()
    return merges


def subword_vocab(df: DataFrame, merges: list,
                  text_col: str = "text") -> DataFrame:
    """(token, freq): corpus token counts after applying the learned
    merges — the tokenizer's unigram table. Merge application is a
    map-side chain of literal replaces (no per-row Python)."""
    sym = _symbolized(word_frequencies(df, text_col))
    col = F.col("sym")
    for _, l, r, _ in merges:
        col = F.replace(col, F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>"))
    arr = F.split(F.regexp_replace(col, "^<|>$", ""), "><")
    return (sym.select(F.explode(arr).alias("token"), "freq")
            .groupBy("token").agg(F.sum("freq").alias("freq")))


def encode_tokens(df: DataFrame, merges: list, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Per-document BPE token array after applying ``merges`` - the
    tokenize-the-corpus step that turns text into training sequences.

    Entirely map-side, zero shuffle: the whole normalized document is
    symbolized at once (only non-space chars are wrapped, so a merge
    literal ``<a><b>`` can never match across a word boundary - applying
    merges at document level is EXACTLY word-level application), the
    merge chain is literal replaces in rank order, and the token array
    falls out of an unwrap+split+flatten. Same replace() semantics in
    DuckDB, which the SQL oracle replays."""
    sym = F.regexp_replace(normalized_text(F.col(text_col)),
                           "([^ ])", "<$1>")
    for _, l, r, _ in merges:
        sym = F.replace(sym, F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>"))
    arr = F.flatten(F.transform(
        F.split(sym, " "),
        lambda s: F.split(F.regexp_replace(s, "^<|>$", ""), "><")))
    arr = F.filter(arr, lambda t: t != "")
    return df.select(F.col(id_col), arr.alias("tokens"))


def encode_bpe(df: DataFrame, merges: list, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Corpus tokenization summary under a learned BPE: per document the
    token count, an md5 digest of the full token stream (captures every
    token and its order without shipping 10^6-row streams through the
    compare), and a token-ID checksum.

    Token IDs come from the subword vocab ranked (freq DESC, token ASC)
    - a window over the vocab-sized table, then a broadcast-sized join
    against the exploded token stream (a tokenizer vocab broadcasts at
    any corpus scale; AQE picks the broadcast automatically). The
    id_checksum = sum of token ids per doc pins the full id assignment
    under the value hash.

    The exploded stream carries ONLY (id, token) and aggregates on the
    bare id - never ride wide columns (the md5 digest) through a
    corpus-scale explode+shuffle: the digest half is pure map-side and
    rejoins on the doc-count-sized result (in-session A/B: 9.0s vs 1.4s
    at sf0.1, 6.5x, BENCH/BASELINE.md)."""
    toks = encode_tokens(df, merges, id_col, text_col)
    from pyspark.sql import Window
    vocab = subword_vocab(df, merges, text_col)
    ranked = vocab.withColumn(
        "token_id", F.row_number().over(
            Window.orderBy(F.desc("freq"), "token")))
    base = toks.select(
        id_col, F.size("tokens").alias("n_tokens"),
        F.md5(F.array_join("tokens", " ")).alias("stream_md5"))
    ids = (toks.select(id_col, F.explode_outer("tokens").alias("token"))
           .join(F.broadcast(ranked.select("token", "token_id")),
                 "token", "left")
           .groupBy(id_col).agg(F.sum("token_id").alias("id_checksum")))
    return (base.join(ids, id_col)
            .select(id_col, "n_tokens", "stream_md5",
                    F.coalesce("id_checksum", F.lit(0)).cast("long")
                    .alias("id_checksum")))
