"""Independent naive BPE twin — the oracle leg for operators/bpe.py.

Implements the SAME spec (symbols = word chars with an `·` end-of-word
marker on the last char; train step merges the (count, pair)-max pair,
ties to the lexicographically greatest pair; zip-counted overlapping
pairs) with deliberately DIFFERENT mechanics, so a shared bug is
unlikely:

* the trainer recomputes the full pair count from scratch every step
  (the engine's trainer maintains counts incrementally with an
  occurrence index);
* encoding applies the merges in learned ORDER, one full pass per
  merge (the engine encodes greedy-by-rank). The two are equivalent
  UNDER AN ASSUMPTION: no merge's output string equals a component of
  an earlier merge (if ('a','bc') and ('ab','c') both yield 'abc', a
  later merge could recreate an earlier merge's input and
  greedy-by-rank would re-apply it while the in-order pass has moved
  on). `encode_word` asserts the assumption per merge list, so a
  vocabulary that violates it fails loudly instead of silently
  diverging from the engine.

Pure Python, no Spark; used by the pytest differential legs and by
the `bpe_tokens` registry oracle (entry_queries computes the expected
counts with this module and serializes them as a VALUES literal).
"""

from __future__ import annotations

EOW = "·"


def symbols(word: str) -> list[str]:
    syms = list(word)
    syms[-1] += EOW
    return syms


def train(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    corpus = [(symbols(w), f) for w, f in word_freqs.items() if w]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in corpus:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        corpus = [(merge_pass(syms, best), f) for syms, f in corpus]
    return merges


def merge_pass(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """One full left-to-right, non-overlapping merge pass."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if (i + 1 < len(syms)
                and syms[i] == pair[0] and syms[i + 1] == pair[1]):
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _check_order_equivalence(merges: list[tuple[str, str]]) -> None:
    """Assert the in-order == greedy-by-rank precondition (see module
    docstring): no merge output equals a LATER merge's component.
    O(len(merges)) with a cached set; True for the fuzzed vocabularies
    and every corpus the oracle has been pointed at. Memoized by
    CONTENT (tuple of pairs) — id() could be reused by a different
    list after the checked one is garbage-collected, silently skipping
    the soundness check."""
    key = tuple(merges)
    if key in _EQUIV_CHECKED:
        return
    outputs_so_far: set[str] = set()
    for i, (a, b) in enumerate(merges):
        # a component produced by an EARLIER merge is fine (that is
        # how multi-char symbols arise); the hazard is the converse —
        # this merge's output string being re-creatable as a later
        # merge's component would make greedy-by-rank re-apply merge i
        if (a + b) in outputs_so_far:
            raise AssertionError(
                f"merge {i} output {a + b!r} duplicates an earlier "
                "merge's output — in-order encoding may diverge from "
                "greedy-by-rank; oracle assumption violated")
        outputs_so_far.add(a + b)
    for i, (a, b) in enumerate(merges):
        for comp in (a, b):
            if comp in outputs_so_far:
                prior = next(k for k, (x, y) in enumerate(merges)
                             if x + y == comp)
                if prior > i:
                    raise AssertionError(
                        f"merge {i} component {comp!r} is merge "
                        f"{prior}'s output (later) — in-order encoding "
                        "may diverge from greedy-by-rank; oracle "
                        "assumption violated")
    _EQUIV_CHECKED.add(key)


_EQUIV_CHECKED: set[tuple] = set()


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply every merge in learned order (not by-rank greedy)."""
    if not word:
        return []
    _check_order_equivalence(merges)
    syms = symbols(word)
    for pair in merges:
        if len(syms) == 1:
            break
        syms = merge_pass(syms, pair)
    return syms


def encode_corpus(texts: list[str],
                  merges: list[tuple[str, str]]) -> list[tuple[int, int]]:
    """Per-text (n_words, n_bpe_tokens) using ASCII-whitespace word
    splitting of the lowercased text — the module spec's word form."""
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    out = []
    memo: dict[str, int] = {}
    for text in texts:
        words = [w for w in ws.split((text or "").lower()) if w]
        ntok = 0
        for w in words:
            n = memo.get(w)
            if n is None:
                n = len(encode_word(w, merges))
                memo[w] = n
            ntok += n
        out.append((len(words), ntok))
    return out


def word_frequencies(texts: list[str]) -> dict[str, int]:
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    freqs: dict[str, int] = {}
    for text in texts:
        for w in ws.split((text or "").lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs
