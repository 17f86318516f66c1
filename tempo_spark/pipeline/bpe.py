"""Learned byte-pair-encoding token counts.

``with_bpe_ish_token_count`` (text.py) is a regex heuristic; every
downstream decision that consumes token counts (``assign_packs``,
``take_token_budget``, ``mix_by_group`` token weighting) inherits its
error. This module trains a REAL merges table from the corpus with the
public BPE algorithm (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") and applies it with pure JVM string
expressions — no Python in the hot path, no vocabulary lookup at apply
time, unseen words segmented exactly.

Design (Spark-first):

- **Training** is the textbook vocabulary-based trainer: ONE distributed
  ``groupBy`` reduces the corpus to a (word, count) vocabulary, the top
  ``max_vocab`` rows are collected (a bounded, contractual collect — the
  same sanctioned class as the k-means fit sample), and the greedy
  most-frequent-pair loop runs driver-side over that bounded table. Pair
  counts are weighted by word frequency, so the result is identical to
  training over the full corpus stream.
- **Application** never touches the vocabulary: a document's text is
  bracketized (every non-space char wrapped in sentinel brackets
  ``\\x02c\\x03``) and each learned merge becomes ONE literal
  ``replace`` — ``\\x02a\\x03\\x02b\\x03 → \\x02ab\\x03`` — chained in
  merge order. Whitespace between words blocks cross-word merges by
  construction. The whole chain is native string expressions inside
  whole-stage codegen: O(num_merges × len) per row, fully distributed,
  zero shuffle, zero collect, streaming-composable.

Determinism contract (what makes the cross-engine value gate possible):
pair counts are *overlapping* adjacent pairs (zip semantics); a merge
applies to *non-overlapping occurrences left-to-right* (the semantics of
``str.replace`` / SQL ``replace`` — identical in Python, Spark, and
DuckDB); ties break by (count DESC, left token ASC, right token ASC) in
binary UTF-8 order (Python code-point order equals UTF-8 byte order);
a round with no pair of count >= 2 learns nothing and ends training
(merging changes nothing thereafter). An external engine can therefore
replay training round-by-round and application replace-by-replace.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Sentinel token brackets. Control chars that essentially never occur in
# corpus text; any occurrences ARE stripped before bracketizing (both in
# training and application, and in the gate oracle) so a hostile byte
# cannot corrupt segment counting.
SO = "\x02"  # token open
SC = "\x03"  # token close

# Literal replace-chain budget for token_count/with_segments: each merge
# is one plan node, and a production tokenizer has 30k-50k merges — a
# replace chain that deep is a Catalyst/plan-build problem (the
# ASSIGN_LITERAL_MAX lesson at expression scale) and executes
# O(num_merges) full string passes per row. Past the budget the Arrow
# kernel takes over: a pandas UDF encoding each DISTINCT word once per
# batch (dict-cached) with the rank-based merge loop — the two paths are
# test-pinned identical (applying the minimum-rank applicable pair until
# none remains equals applying the merge list once each in order, because
# a merged pair's adjacency can never reappear after its pass).
REPLACE_CHAIN_MAX = 128


def _strip_sentinels(text: Column) -> Column:
    return F.replace(
        F.replace(text, F.lit(SO), F.lit("")), F.lit(SC), F.lit("")
    )


def _bracketize(text: Column) -> Column:
    """Wrap every non-whitespace char: 'ab cd' -> '⟨a⟩⟨b⟩ ⟨c⟩⟨d⟩'
    (shown with visible brackets; the real sentinels are \\x02/\\x03).
    Whitespace survives unbracketed and blocks cross-word merges."""
    return F.regexp_replace(_strip_sentinels(text), r"(\S)", f"{SO}$1{SC}")


#: The Java \\s set as UTF-8 byte values — the byte-level pretoken
#: separators. Unicode whitespace (U+00A0 etc.) is NOT Java \\s, so its
#: bytes stay token bytes, exactly like the char-level engine treats the
#: char itself.
_WS_BYTES = ("20", "09", "0A", "0B", "0C", "0D")

#: Full byte alphabet as fixed-width uppercase hex (GPT-2-style: every
#: byte is in-vocabulary, so byte-level models never emit <unk>).
_BYTE_ALPHABET = [f"{i:02X}" for i in range(256)]


def _bracketize_bytes(text: Column) -> Column:
    """Byte-level bracketization: the text's UTF-8 bytes render as
    fixed-width uppercase hex pairs (the byte→printable table — hex is
    the engine-portable choice: Spark, DuckDB and Python all produce the
    identical string), each pair wrapped in sentinels; the six Java-\\s
    whitespace bytes then UNwrap to a plain space so merges never span
    pretokens. Alignment is guaranteed by the pair-consuming regex —
    a naive replace('20', …) could match across two byte boundaries."""
    h = F.upper(F.hex(F.encode(_strip_sentinels(text), "UTF-8")))
    s = F.regexp_replace(h, "([0-9A-F]{2})", f"{SO}$1{SC}")
    for wb in _WS_BYTES:
        s = F.replace(s, F.lit(f"{SO}{wb}{SC}"), F.lit(" "))
    return s


def _hex_tokens(word: str) -> List[str]:
    h = word.encode("utf-8").hex().upper()
    return [h[i: i + 2] for i in range(0, len(h), 2)]


def _apply_merges(s: Column, merges: Iterable[Tuple[str, str]]) -> Column:
    for a, b in merges:
        s = F.replace(s, F.lit(f"{SO}{a}{SC}{SO}{b}{SC}"), F.lit(f"{SO}{a}{b}{SC}"))
    return s


class BPEModel:
    """An ordered merges table + the native-expression applicators.

    ``base_chars`` (optional; populated by :func:`train_bpe`) is the
    sorted base alphabet of the training vocabulary — required only by
    :meth:`encode_ids`, which needs a stable piece→id mapping.

    ``level``: ``"char"`` (Sennrich word-grain, the default) or
    ``"byte"`` (GPT-2-style byte-level — tokens are the UTF-8 bytes
    rendered as fixed-width uppercase hex pairs, the full 256-byte
    alphabet is in-vocabulary so ``<unk>`` never occurs, and merges
    operate on byte tokens). Both levels share every applicator; only
    the initial segmentation differs."""

    def __init__(
        self, merges: List[Tuple[str, str]], base_chars=None,
        level: str = "char",
    ):
        if level not in ("char", "byte"):
            raise ValueError(f"level must be 'char' or 'byte', got {level!r}")
        self.level = level
        self.merges = [(str(a), str(b)) for a, b in merges]
        # `is not None`, not truthiness: an EMPTY alphabet is a real
        # trained state (degenerate corpus) whose vocab is just <unk> —
        # distinct from a legacy/hand-built model with no alphabet at all
        self.base_chars = (
            sorted({str(c) for c in base_chars})
            if base_chars is not None
            else None
        )

    def vocab(self) -> List[str]:
        """Piece list defining token ids: id 0 = ``<unk>`` (an apply-time
        char outside the training alphabet), then the sorted base
        alphabet, then each merge's output token in merge order (a
        duplicate merged string — e.g. (a,bc) and (ab,c) both yielding
        'abc' — keeps its FIRST id). Stable across save/load."""
        if self.base_chars is None:
            raise ValueError(
                "this model carries no base alphabet — retrain with "
                "train_bpe (or load a model saved by it) to use token ids"
            )
        out = ["<unk>"] + list(self.base_chars)
        seen = set(out)
        for a, b in self.merges:
            tok = a + b
            if tok not in seen:
                out.append(tok)
                seen.add(tok)
        return out

    # ------------------------------------------------------------ apply

    def segmented_expr(self, text: Column) -> Column:
        """Bracketized text with all merges applied (the internal
        representation; useful for debugging and for the token array).
        Byte-level models bracketize hex byte pairs instead of chars."""
        brk = _bracketize_bytes if self.level == "byte" else _bracketize
        return _apply_merges(brk(text), self.merges)

    def token_count(
        self,
        df: DataFrame,
        text_col: str = "text",
        out: str = "n_bpe_tokens",
        engine: str = "auto",
    ) -> DataFrame:
        """df + ``out``: the exact BPE piece count per row (long; NULL for
        NULL text, 0 for empty/whitespace-only).

        ``engine``: ``"expr"`` = chained-replace JVM expressions (codegen,
        zero Python; right for small merge tables), ``"arrow"`` = pandas
        UDF with a per-batch distinct-word cache and the rank-based merge
        loop (right for production-sized merge tables), ``"auto"`` =
        expr iff ``len(merges) <= REPLACE_CHAIN_MAX``. Both engines are
        test-pinned to identical outputs."""
        if out in df.columns:
            raise ValueError(f"output column {out!r} already exists")
        if engine == "auto":
            engine = "expr" if len(self.merges) <= REPLACE_CHAIN_MAX else "arrow"
        if engine == "expr":
            s = self.segmented_expr(F.col(text_col))
            count = (
                F.length(s) - F.length(F.replace(s, F.lit(SC), F.lit("")))
            ).cast("long")
            return df.withColumn(
                out, F.when(F.col(text_col).isNotNull(), count)
            )
        if engine != "arrow":
            raise ValueError(f"unknown engine {engine!r}; use expr/arrow/auto")
        return df.withColumn(out, self._arrow_count_udf()(F.col(text_col)))

    def _word_encoder(self):
        """word -> list of pieces, the rank-based merge loop (identical
        semantics to the expr engine's replace chain; shared by the count
        and token-id kernels)."""
        ranks = {pair: i for i, pair in enumerate(self.merges)}
        initial = _hex_tokens if self.level == "byte" else list

        def encode_pieces(word: str):
            toks = initial(word)
            while len(toks) > 1:
                best = None
                for i in range(len(toks) - 1):
                    r = ranks.get((toks[i], toks[i + 1]))
                    if r is not None and (best is None or r < best[0]):
                        best = (r, toks[i], toks[i + 1])
                if best is None:
                    break
                _, a, b = best
                nxt, i = [], 0
                # single left-to-right non-overlapping pass — the exact
                # replace() semantics of the expr engine
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                        nxt.append(a + b)
                        i += 2
                    else:
                        nxt.append(toks[i])
                        i += 1
                toks = nxt
            return toks

        return encode_pieces

    def _arrow_doc_udf(self, per_word, init, fold, rtype):
        """Shared doc-kernel factory: split like Java \\s (ASCII-only --
        python str.split() would word-break on unicode spaces the expr
        engine treats as token chars), strip sentinels, encode each
        DISTINCT word once per batch (dict cache), fold per-word values
        into the doc accumulator. Used by the count and token-id kernels
        so the word-splitting contract cannot drift between them."""
        import re

        from pyspark.sql.functions import pandas_udf

        encode_pieces = self._word_encoder()
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        @pandas_udf(rtype)
        def doc_udf(texts: pd.Series) -> pd.Series:
            cache: dict = {}

            def doc(t):
                if t is None:
                    return None
                acc = init()
                for w in ws.split(t.replace(SO, "").replace(SC, "")):
                    if not w:
                        continue
                    v = cache.get(w)
                    if v is None:
                        v = per_word(encode_pieces(w))
                        cache[w] = v
                    acc = fold(acc, v)
                return acc

            return texts.map(doc)

        return doc_udf

    def _arrow_count_udf(self):
        return self._arrow_doc_udf(
            per_word=len, init=int, fold=lambda acc, v: acc + v, rtype="long"
        )

    def with_segments(
        self, df: DataFrame, text_col: str = "text", out: str = "bpe_pieces"
    ) -> DataFrame:
        """df + ``out``: array<string> of the BPE pieces in order (word
        boundaries dissolve — pieces never span whitespace by
        construction, so downstream consumers can re-window freely).
        Expression path only (a debug/inspection surface) — use
        ``token_count`` for production-sized merge tables."""
        if out in df.columns:
            raise ValueError(f"output column {out!r} already exists")
        if len(self.merges) > REPLACE_CHAIN_MAX:
            raise ValueError(
                f"with_segments is expression-path only and this model has "
                f"{len(self.merges)} merges > REPLACE_CHAIN_MAX="
                f"{REPLACE_CHAIN_MAX}; use token_count (arrow engine)"
            )
        s = self.segmented_expr(F.col(text_col))
        return df.withColumn(
            out,
            F.when(
                F.col(text_col).isNotNull(),
                F.regexp_extract_all(s, F.lit(f"{SO}([^{SC}]*){SC}"), 1),
            ),
        )

    def encode_ids(
        self, df: DataFrame, text_col: str = "text", out: str = "token_ids"
    ) -> DataFrame:
        """df + ``out``: array<int> of token ids per row (the training
        export format — see :meth:`vocab` for the id scheme; chars outside
        the training alphabet map to ``<unk>`` = 0; NULL text -> NULL).
        Arrow kernel with a distinct-word cache — token-id emission has no
        practical expression path (a piece→id map literal is plan bloat,
        the ASSIGN_LITERAL_MAX lesson)."""
        if out in df.columns:
            raise ValueError(f"output column {out!r} already exists")
        vocab = {p: i for i, p in enumerate(self.vocab())}
        ids_of = self._arrow_doc_udf(
            per_word=lambda pieces: [vocab.get(p, 0) for p in pieces],
            init=list,
            fold=lambda acc, v: acc + v,
            rtype="array<int>",
        )
        return df.withColumn(out, ids_of(F.col(text_col)))

    # ------------------------------------------------------------ io

    def save(self, spark, path: str) -> None:
        """Persist the model as parquet: merge rows (kind='merge', ordered
        by idx) plus base-alphabet rows (kind='base') when present."""
        rows = [(i, a, b, "merge") for i, (a, b) in enumerate(self.merges)]
        rows.append((-2, self.level, None, "level"))
        if self.base_chars is not None:
            # marker row so an EMPTY alphabet round-trips as [] not None
            rows.append((-1, None, None, "base_meta"))
            rows += [
                (i, c, None, "base") for i, c in enumerate(self.base_chars)
            ]
        spark.createDataFrame(
            rows, "idx int, left string, right string, kind string"
        ).coalesce(1).write.mode("overwrite").parquet(path)

    @staticmethod
    def load(spark, path: str) -> "BPEModel":
        rows = spark.read.parquet(path).orderBy("idx").collect()
        kinds = {getattr(r, "kind", "merge") for r in rows}
        merges = [
            (r.left, r.right)
            for r in rows
            if getattr(r, "kind", "merge") in ("merge", None)
        ]
        base = (
            [r.left for r in rows if getattr(r, "kind", None) == "base"]
            if "base_meta" in kinds
            else None
        )
        level = next(
            (r.left for r in rows if getattr(r, "kind", None) == "level"),
            "char",  # pre-r11 models carry no level row
        )
        return BPEModel(merges, base_chars=base, level=level)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 64,
    max_vocab: int = 65536,
    min_pair_count: int = 2,
    level: str = "char",
) -> BPEModel:
    """Train a BPE merges table from the corpus (see module docstring).

    ``max_vocab`` bounds the driver collect: the vocabulary is the top
    ``max_vocab`` distinct words by (count DESC, word ASC). On a
    real-scale corpus the dropped tail is hapax noise whose pair mass is
    negligible; the bound is structural (a LIMIT inside the plan), so the
    collect can never exceed it regardless of corpus size.
    ``min_pair_count``: a round whose best pair occurs fewer than this
    many times (weighted) learns nothing and ends training.

    ``level="byte"`` trains a GPT-2-style byte-level model: each
    vocabulary word segments into its UTF-8 bytes (rendered as hex
    pairs — see :func:`_bracketize_bytes`), the base alphabet is ALL
    256 bytes (so ``encode_ids`` never emits ``<unk>``), and merges
    operate on byte tokens. Pretokenization (the whitespace word split)
    and the trainer/applicator machinery are unchanged.

    Trainer cost is O(total pair-count updates · log heap), NOT
    O(num_merges × vocab): each merge touches only the words containing
    the merged pair (incremental index + lazy-invalidation heap — the
    standard efficient Sennrich trainer; measured 8192 merges over a
    30k-word vocab ≈ 5 s driver time, where a naive full recount per
    round is minutes-to-hours). Merge sequence is test-pinned identical
    to the naive recount.
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if max_vocab < 1:
        raise ValueError(f"max_vocab must be >= 1, got {max_vocab}")
    if level not in ("char", "byte"):
        raise ValueError(f"level must be 'char' or 'byte', got {level!r}")
    words = (
        df.select(
            F.explode(
                F.split(F.trim(_strip_sentinels(F.col(text_col))), r"\s+")
            ).alias("__w")
        )
        .where(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__w").asc())
        .limit(max_vocab)
        .collect()
    )
    # driver-side greedy loop over the bounded vocab. INCREMENTAL pair
    # maintenance (the standard efficient Sennrich trainer): a full
    # recount-per-round is O(num_merges × vocab × word_len) — hours at a
    # production num_merges — whereas each merge only changes pair counts
    # inside the words that CONTAIN the merged pair, so we index
    # pair → {word ids}, diff each touched word's pair multiset before/
    # after its merge pass, and pick the next best pair from a
    # lazy-invalidation max-heap (entries whose recorded count no longer
    # matches the live count are popped and skipped). Ordering semantics
    # are IDENTICAL to the naive recount: overlapping zip pair counts,
    # best = (count DESC, pair ASC), merge = one non-overlapping
    # left-to-right pass per word (test-pinned against the brute-force
    # reference model).
    import heapq
    from collections import Counter

    if level == "byte":
        segs: List[List[str]] = [_hex_tokens(r["__w"]) for r in words]
        base_chars = list(_BYTE_ALPHABET)
    else:
        segs = [list(r["__w"]) for r in words]
        base_chars = sorted({c for toks in segs for c in toks})
    cnts: List[int] = [int(r["__c"]) for r in words]
    pair_counts: dict = {}
    pair_words: dict = {}
    for wi, toks in enumerate(segs):
        c = cnts[wi]
        for p in zip(toks, toks[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-n, p) for p, n in pair_counts.items()]
    heapq.heapify(heap)

    def _merge_pass(toks: List[str], a: str, b: str) -> List[str]:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    merges: List[Tuple[str, str]] = []
    while len(merges) < num_merges:
        best = None
        while heap:
            n, p = heap[0]
            if pair_counts.get(p, 0) == -n and -n > 0:
                best = (p, -n)
                break
            heapq.heappop(heap)  # stale or zeroed entry
        if best is None or best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        for wi in list(pair_words.get((a, b), ())):
            toks = segs[wi]
            new = _merge_pass(toks, a, b)
            c = cnts[wi]
            delta = Counter(zip(new, new[1:]))
            delta.subtract(Counter(zip(toks, toks[1:])))
            for p, d in delta.items():
                if d == 0:
                    continue
                pair_counts[p] = pair_counts.get(p, 0) + c * d
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                else:
                    heapq.heappush(heap, (-pair_counts[p], p))
                members = pair_words.setdefault(p, set())
                if p in delta and any(
                    new[i] == p[0] and new[i + 1] == p[1]
                    for i in range(len(new) - 1)
                ):
                    members.add(wi)
                else:
                    members.discard(wi)
            segs[wi] = new
        pair_words.pop((a, b), None)
    return BPEModel(merges, base_chars=base_chars, level=level)
