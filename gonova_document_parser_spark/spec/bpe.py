"""Merge-table BPE tokenizer (spec side — the pure-Python oracle).

The driver queries keep estimating token budgets with the RE2-safe GPT-2
pre-tokenizer regex (``textstats.bpe_token_count_expr`` — DuckDB-parity
required there); THIS module is the real thing training budgets are
denominated in: a Sennrich-style byte-pair-encoding over a committed
merges fixture, applied per pre-token.  The engine twin is
``functions.embeddings``-style Arrow-batched pandas UDFs in
``functions.textstats.bpe_encode_udf`` — pytest pins spec-vs-engine
identity token-for-token (the UDF body IS ``encode_word``/``encode``, so
the contract cannot drift).

Reference anchor: the reference counts "tokens" only as whitespace words
for its chunking decisions (``document_analyzer.py`` word heuristics);
an LLM-data pipeline needs subword counts, so this is a
beyond-the-reference operator (SURVEY "training-data pipeline" tier).

Algorithm (classic BPE, Sennrich et al. 2016, GPT-2 flavor):
  - pre-tokenize text with ``PRETOKEN_RE`` (lowercased — same
    normalization every textstats operator uses);
  - each pre-token starts as a tuple of single characters;
  - training: repeatedly count adjacent symbol pairs across the corpus
    (weighted by pre-token frequency) and merge the most frequent pair —
    ties break lexicographically, so training is fully deterministic;
  - encoding: apply the learned merges in rank order to a word until no
    mergeable pair remains (lowest-rank pair first — identical to the
    GPT-2 encoder loop).

No network, no model download: the committed fixture
``tests/fixtures/bpe_merges.txt`` is trained by
``tests/fixtures/make_bpe_merges.py`` on a pinned text corpus and
sha256-pinned in tests.
"""

from __future__ import annotations

import re

# the same pattern as textstats.word_token_count_expr's column expression
# (alnum runs / single non-alnum, lowercased) — deliberately the SIMPLER
# of the two pre-tokenizers, NOT textstats.BPE_TOKEN_RE (the contraction/
# \p{L} GPT-2 one): merge training operates per word, where this split
# is equivalent and keeps the committed merges fixture charset-stable.
# Changing either copy changes spec token output AND the fixture bytes.
PRETOKEN_RE = re.compile(r"([a-z0-9]+|[^\sa-z0-9])")


def pretokens(text: str) -> list[str]:
    return PRETOKEN_RE.findall(text.lower())


def _pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from ``texts`` (deterministic).

    Pair counts are weighted by pre-token frequency; the argmax ties
    break on the pair itself (lexicographic), so the merges list is a
    pure function of the corpus.
    """
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in pretokens(t):
            vocab[tuple(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                counts[(word[i], word[i + 1])] += freq
        if not counts:
            break
        # tie-break: highest count, then lexicographically SMALLEST pair
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append(best_pair)
        merged = "".join(best_pair)
        new_vocab = Counter()
        for word, freq in vocab.items():
            if best_pair not in _pairs(word):
                new_vocab[word] += freq
                continue
            out, i = [], 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best_pair[0]
                    and word[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one pre-token, lowest-rank pair first (GPT-2 loop)."""
    syms = list(word)
    while len(syms) > 1:
        ranked = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not ranked:
            break
        # merge EVERY occurrence of the chosen (lowest-rank) pair in one
        # pass, left to right — the standard encoder behavior
        _, at = min(ranked)
        a, b = syms[at], syms[at + 1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def make_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    """Precompute the pair -> rank map once (the UDFs build it per batch
    closure, not per row)."""
    return {p: i for i, p in enumerate(merges)}


def encode(
    text: str,
    merges: list[tuple[str, str]],
    _cache: dict | None = None,
    _ranks: dict | None = None,
) -> list[str]:
    """Full-text BPE: pre-tokenize, then merge-encode each pre-token.

    ``_cache`` (word -> encoded tuple) amortizes repeated words; the
    Arrow UDF passes a per-batch dict (natural-language word frequency
    is Zipfian, so the hit rate is high).  ``_ranks`` skips the per-call
    rank-map build when the caller precomputed it via ``make_ranks``.
    """
    ranks = _ranks if _ranks is not None else make_ranks(merges)
    out: list[str] = []
    for w in pretokens(text):
        if _cache is None:
            out.extend(encode_word(w, ranks))
        else:
            got = _cache.get(w)
            if got is None:
                got = tuple(encode_word(w, ranks))
                _cache[w] = got
            out.extend(got)
    return out


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: gonova-bpe-1\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    merges = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            a, b = line.rstrip("\n").split(" ", 1)
            merges.append((a, b))
    return merges
