"""Byte-pair-encoding tokenizer: the ENCODE step a training-data
pipeline runs between text curation and sequence packing.

Training-data extension (not in the reference). The design follows the
shape every production tokenizer trainer uses (and the only one that
scales): BPE statistics depend ONLY on the distinct-word frequency
table, which is vocab-bounded regardless of corpus size — so

1. :func:`word_counts` aggregates ``(word, count)`` distributed (one
   map-side-combined shuffle, output bounded by distinct words);
2. :func:`train_bpe` runs the classic merge loop DRIVER-side over that
   bounded table (the same posture as the IVF quantizer: the only
   driver collect is a bounded aggregate, never the corpus);
3. encoding applies the learned merges per word:
   - :func:`bpe_apply_expr` — pure Catalyst column expression
     (space-out chars, then one ``replace`` per merge in rank order).
     Zero Python, fully whole-stage-codegen'd for small merge tables,
     and reproducible by any engine with ``replace`` — which is what
     makes the DuckDB oracle possible. Plan size grows with the merge
     count: use it for small/fixture tables (≲200 merges).
   - :func:`bpe_encode_arrow` — Arrow-batched ``mapInPandas`` kernel
     with a per-batch distinct-word cache (each unique word is encoded
     once per batch — the Zipf distribution makes the cache hit rate
     ≈ 1 at web scale). The production path for 50k-merge tables,
     where a 50k-deep expression chain is not a reasonable plan.

Both apply paths implement the identical algorithm — sequential global
leftmost-nonoverlapping replace per merge in rank order over the
spaced-symbol representation, ``</w>`` end-of-word marker — and are
parity-tested against each other and against a pure-Python reference.

Token ids are engine-portable: ``md5(token) mod id_space`` (the same
derivation the oracle fixtures use), so two engines agree on ids
without sharing a vocabulary file.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "train_bpe", "bpe_apply_expr",
           "bpe_encode_arrow", "bpe_encode_word", "END"]

END = "</w>"


# ---------------------------------------------------------------------------
# distributed word counts (the only corpus-wide pass)
# ---------------------------------------------------------------------------

def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, c)`` over whitespace-split text. One explode + one
    map-side-combined groupBy; output rows = distinct words
    (vocab-bounded — the whole reason BPE training scales)."""
    return (df.select(F.explode(F.split(F.col(text_col), r"\s+"))
                      .alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word").agg(F.count("*").alias("c")))


# ---------------------------------------------------------------------------
# driver-side trainer over the bounded word table
# ---------------------------------------------------------------------------

def train_bpe(words: list[tuple[str, int]],
              n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a ``(word, count)`` table: at each
    step merge the most frequent adjacent symbol pair (ties broken by
    lexicographic pair order, so training is DETERMINISTIC across
    runs and platforms). Pure Python on the vocab-bounded table —
    cost is independent of corpus size."""
    seqs: list[tuple[list[str], int]] = [
        (list(w[:-1]) + [w[-1] + END], int(c)) for w, c in words if w]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, c in seqs:
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max by (count, reversed lexicographic) → deterministic ties
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for i, (seq, c) in enumerate(seqs):
            j, out = 0, []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[i] = (out, c)
    return merges


# ---------------------------------------------------------------------------
# reference single-word encoder (the algorithm both Spark paths mirror)
# ---------------------------------------------------------------------------

def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word: sequential global leftmost-nonoverlapping
    replace per merge in RANK order over the symbol sequence."""
    seq = list(word[:-1]) + [word[-1] + END] if word else []
    for a, b in merges:
        j, out = 0, []
        while j < len(seq):
            if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(seq[j])
                j += 1
        seq = out
    return seq


# ---------------------------------------------------------------------------
# apply path 1: pure Catalyst (oracle-able; small merge tables)
# ---------------------------------------------------------------------------

def bpe_apply_expr(text_col: str | Column,
                   merges: list[tuple[str, str]],
                   id_space: int = 50000) -> Column:
    """``array<int>`` of BPE token ids for whitespace-split text as a
    pure column expression.

    Construction mirrors :func:`bpe_encode_word` exactly, in string
    space: each word becomes a sentinel-padded spaced symbol sequence
    (``" t h e</w> "``) and each merge is a literal
    ``replace(' a b ' → ' ab ')`` applied TWICE — consecutive
    occurrences share their boundary space, so one left-to-right
    non-overlapping pass merges alternates and the second pass
    finishes the (now isolated) remainder; for ``a != b`` the pairing
    is forced, so two passes reproduce the reference exactly.
    ``a == b`` merges are ORDER-ambiguous under global replace (the
    reference pairs strictly left-to-right) and are rejected here —
    use :func:`bpe_encode_arrow` for tables containing them.
    ``replace`` is leftmost-nonoverlapping in Spark, DuckDB, and every
    mainstream engine — the portability contract the oracle relies on.
    Token ids hash the symbol strings with the portable md5-mod
    derivation.

    Cost shape (measured): plan analysis/codegen is ∝ merge count and
    paid ONCE per job (~7 s for a 10-merge chain, first run only);
    execution is row-linear and scan-bound afterwards (0.7 s flat from
    500 → 5000 docs on local[32]). At job scale the compile cost is
    noise; in a REPL loop prefer :func:`bpe_encode_arrow`.
    """
    for a, b in merges:
        if a == b:
            raise ValueError(
                f"bpe_apply_expr: self-merge {(a, b)!r} is ambiguous "
                "under global replace; use bpe_encode_arrow")
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def encode_word(w: Column) -> Column:
        # "the" → " t h e " → " t h e</w> "
        spaced = F.concat(F.lit(" "),
                          F.regexp_replace(w, r"(.)", "$1 "))
        spaced = F.regexp_replace(spaced, r" $", END + " ")
        for a, b in merges:
            pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
            spaced = F.replace(F.replace(spaced, pat, rep), pat, rep)
        return spaced

    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    toks = F.flatten(F.transform(
        words,
        lambda w: F.filter(F.split(F.trim(encode_word(w)), " "),
                           lambda t: t != "")))
    return F.transform(
        toks,
        lambda t: (F.conv(F.substring(F.md5(t), 1, 7), 16, 10)
                   .cast("long") % id_space).cast("int"))


# ---------------------------------------------------------------------------
# apply path 2: Arrow word-cache kernel (production merge tables)
# ---------------------------------------------------------------------------

def bpe_encode_arrow(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text", out_col: str = "tokens",
                     id_space: int = 50000) -> DataFrame:
    """mapInPandas BPE encode with a per-batch distinct-word cache.

    The merges list rides the closure (broadcast to executors once);
    each Arrow batch splits its texts, encodes every DISTINCT word once
    (Zipf ⇒ cache hit rate ≈ 1), and maps symbols to the same portable
    md5-mod ids as :func:`bpe_apply_expr` — the two paths are
    interchangeable and parity-tested token-for-token.
    """
    import hashlib

    schema = ",".join(f"{f.name} {f.dataType.simpleString()}"
                      for f in df.schema.fields)
    schema += f", {out_col} array<int>"

    def tok_id(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % id_space

    def op(batches: Iterator) -> Iterator:
        for pdf in batches:
            cache: dict[str, list[int]] = {}

            def enc(text: str | None) -> list[int]:
                if text is None:
                    return []
                out: list[int] = []
                for w in text.split():
                    ids = cache.get(w)
                    if ids is None:
                        ids = [tok_id(t) for t in
                               bpe_encode_word(w, merges)]
                        cache[w] = ids
                    out.extend(ids)
                return out

            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf

    return df.mapInPandas(op, schema=schema)
