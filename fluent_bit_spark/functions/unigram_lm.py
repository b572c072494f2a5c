"""Unigram-LM (SentencePiece-style) tokenizer: integer-cost Viterbi
encoding + a driver-side hard-EM trainer (Kudo 2018, arXiv:1804.10959)
— the second major subword algorithm beside BPE (functions/bpe.py),
sharing its scale posture:

- the TRAINER runs driver-side over the VOCAB-BOUNDED distinct-word
  table (``word_counts`` — one map-side-combined shuffle; the only
  collect is that bounded aggregate), using HARD-EM (Viterbi counts,
  the standard deterministic variant): segment every word with the
  current piece costs, accumulate piece counts weighted by word
  frequency, re-estimate costs as integer milli-nats
  (``round(-ln(c/total)·1000)``), prune the least-used pieces, repeat.
  Deterministic tie-breaks everywhere (lexicographic piece order;
  combined-cost DP below), so two runs — or two engines — produce the
  identical vocab.

- ENCODING minimizes the COMBINED integer objective
  ``cost·64 + n_pieces`` per word (lexicographic (cost, pieces) — the
  +pieces term resolves equal-cost ties deterministically, and 64 >
  any per-word piece count at ``MAX_WORD_LEN`` ≤ 16). Single-character
  fallbacks guarantee every word segments: characters outside the
  vocab cost ``UNK_COST``; words longer than ``MAX_WORD_LEN`` are a
  single overlong piece at ``len·UNK_COST`` (documented contract, the
  oracle replays it). Per-word DP is O(len · max_piece_len).

The per-document encode runs as a mapInPandas kernel with a
module-level word cache (Zipf ⇒ hit rate ≈ 1 — the bpe_encode_arrow
posture); the DuckDB oracle replays the DP exactly via an UNROLLED
position-by-position SQL chain (tools: _viterbi_oracle_sql in
queries.py) — costs and piece counts are pure integers end-to-end, so
the value hash is exact.
"""

from __future__ import annotations

import math
from collections import Counter

MAX_WORD_LEN = 16
UNK_COST = 14_000          # milli-nats for an out-of-vocab character
PIECES_SHIFT = 64          # combined = cost * 64 + n_pieces


def viterbi_word(word: str, costs: dict[str, int]) -> tuple[list[str], int, int]:
    """Segment one word minimizing ``cost·64 + n_pieces``; returns
    (pieces, cost_millinats, n_pieces). Pure-integer DP; characters
    missing from ``costs`` fall back to UNK_COST; words longer than
    MAX_WORD_LEN collapse to one overlong piece."""
    L = len(word)
    if L == 0:
        return [], 0, 0
    if L > MAX_WORD_LEN:
        return [word], L * UNK_COST, 1
    max_len = max((len(p) for p in costs), default=1)
    best = [0] + [None] * L          # combined objective per prefix
    back: list[tuple[int, str] | None] = [None] * (L + 1)
    for j in range(1, L + 1):
        for pl in range(1, min(max_len, j) + 1):
            piece = word[j - pl:j]
            c = costs.get(piece)
            if c is None:
                if pl != 1:
                    continue
                c = UNK_COST
            prev = best[j - pl]
            if prev is None:
                continue
            cand = prev + c * PIECES_SHIFT + 1
            if best[j] is None or cand < best[j]:
                best[j] = cand
                back[j] = (j - pl, piece)
    pieces: list[str] = []
    j = L
    while j > 0:
        j2, piece = back[j]
        pieces.append(piece)
        j = j2
    pieces.reverse()
    combined = best[L]
    return pieces, combined // PIECES_SHIFT, combined % PIECES_SHIFT


def _estimate_costs(counts: Counter, pieces: list[str]) -> dict[str, int]:
    total = sum(counts[p] for p in pieces) or 1
    return {p: max(1, round(-math.log(max(counts[p], 1) / total)
                            * 1000))
            for p in pieces}


def train_unigram_lm(word_freqs: dict[str, int], vocab_size: int = 64,
                     max_piece_len: int = 4, n_iters: int = 3,
                     seed_candidates: int = 512,
                     prune_frac: float = 0.25) -> list[tuple[str, int]]:
    """Driver-side hard-EM trainer over a bounded word-frequency
    table. Returns ``[(piece, cost_millinats)]`` sorted by (cost,
    piece) — deterministic. Single characters present in the corpus
    are never pruned (segmentability guarantee)."""
    chars = sorted({ch for w in word_freqs for ch in w})
    subs: Counter = Counter()
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for pl in range(2, max_piece_len + 1):
                if i + pl <= len(w):
                    subs[w[i:i + pl]] += f
    multi = [p for p, _ in sorted(subs.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:seed_candidates]]
    pieces = sorted(set(chars) | set(multi))
    counts = Counter({p: subs.get(p, 0)
                      + sum(f for w, f in word_freqs.items()
                            if p == w) + 1 for p in pieces})
    for _ in range(n_iters):
        costs = _estimate_costs(counts, pieces)
        counts = Counter()
        for w, f in word_freqs.items():
            segd, _, _ = viterbi_word(w, costs)
            for p in segd:
                counts[p] += f
        # prune the least-used multi-char pieces (chars are protected)
        keep_multi = [p for p in pieces if len(p) > 1]
        keep_multi.sort(key=lambda p: (counts[p], p))
        n_prune = max(0, min(len(keep_multi),
                             int(len(keep_multi) * prune_frac)))
        if len(pieces) - n_prune > vocab_size:
            n_prune = len(pieces) - vocab_size
        pruned = set(keep_multi[:n_prune]) if n_prune > 0 else set()
        pieces = [p for p in pieces if p not in pruned]
        counts = Counter({p: max(counts[p], 1) for p in pieces})
    while len(pieces) > vocab_size:
        worst = min((p for p in pieces if len(p) > 1),
                    key=lambda p: (counts[p], p), default=None)
        if worst is None:
            break
        pieces.remove(worst)
    costs = _estimate_costs(counts, pieces)
    return sorted(costs.items(), key=lambda kv: (kv[1], kv[0]))


def unigram_encode_pandas(df, vocab: list[tuple[str, int]],
                          text_col: str = "text",
                          id_cols: tuple[str, ...] = ("doc_id",
                                                      "source")):
    """Per-document unigram-LM encoding as a mapInPandas kernel with a
    module-level word→segmentation cache (Zipf ⇒ hit rate ≈ 1; the
    bpe_encode_arrow posture — per-word DP never touches the JVM).
    Emits ``n_pieces``, ``cost_millinats`` (integer Viterbi totals)
    and ``piece_md5`` over the piece-id sequence (ids = rank in the
    sorted vocab; UNK/overlong pieces id -1)."""
    import hashlib

    from pyspark.sql import types as T

    costs = dict(vocab)
    ids = {p: i for i, (p, _) in enumerate(vocab)}
    schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("n_pieces", T.LongType()),
           T.StructField("cost_millinats", T.LongType()),
           T.StructField("piece_md5", T.StringType()),
           T.StructField("tokens", T.ArrayType(T.IntegerType()))])
    cache: dict = {}

    def seg(word: str):
        hit = cache.get(word)
        if hit is None:
            pieces, cost, n = viterbi_word(word, costs)
            hit = ([ids.get(p, -1) for p in pieces], cost, n)
            cache[word] = hit
        return hit

    def run(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                total_c = total_n = 0
                pid: list[int] = []
                for w in str(r[text_col]).split(" "):
                    if not w:
                        continue
                    p, c, n = seg(w)
                    pid.extend(p)
                    total_c += c
                    total_n += n
                rows.append([*(r[c] for c in id_cols), total_n,
                             total_c,
                             hashlib.md5(" ".join(map(str, pid))
                                         .encode()).hexdigest(),
                             pid])
            yield pd.DataFrame(rows, columns=[*id_cols, "n_pieces",
                                              "cost_millinats",
                                              "piece_md5", "tokens"])

    return df.select(*id_cols, text_col).mapInPandas(run, schema)


def unigram_decode(df, vocab: list[tuple[str, int]],
                   tokens_col: str = "tokens",
                   out_col: str = "text_decoded"):
    """Decode piece-id arrays back to text (ids = rank in the sorted
    vocab, the :func:`unigram_encode_pandas` contract): pure-Catalyst
    id→piece map lookup + within-word concatenation. Because the
    encoder works word-by-word on space-split text, decoding joins
    pieces with EMPTY string — word boundaries are the caller's
    framing (the roundtrip invariant ``concat(pieces) == word`` per
    word is pytest-pinned; whole-doc roundtrip holds when the encode
    input had single spaces). Unknown ids (-1 UNK markers) decode to
    the empty string and are counted in ``n_unk_pieces``.

    MAP-ONLY: a create_map literal over the VOCAB (bounded — unlike
    remap_vocab's corpus mapping, a tokenizer vocab is small by
    construction, the same bound that lets the encode kernel cache
    it)."""
    from pyspark.sql import functions as F
    m = F.create_map(*[x for i, (p, _) in enumerate(vocab)
                       for x in (F.lit(i), F.lit(p))])
    return (df.withColumn(
                out_col,
                F.concat_ws("", F.transform(
                    F.col(tokens_col),
                    lambda t: F.coalesce(m[t], F.lit("")))))
            .withColumn("n_unk_pieces",
                        F.size(F.filter(F.col(tokens_col),
                                        lambda t: t < 0))
                         .cast("long")))
