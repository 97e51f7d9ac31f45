"""Offline BPE trainer for the committed fixture merge table.

Reproduces `sparkml_spark/functions/subword.py::BPE_MERGES` from
first principles: classic byte-pair-encoding training (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") over the corpus word-frequency table at sf0.001 —
repeatedly merge the most frequent adjacent symbol pair, with a
DETERMINISTIC tie-break (max count, then lexicographically smallest
pair) so the table is reproducible with no RNG and no seed.

The trainer is OFFLINE by design: production BPE vocabularies are
trained once and shipped as an artifact; the engine only ever runs
inference against the committed table. Re-run this script and diff
its output against BPE_MERGES to audit the fixture.

It also verifies the inference contract the engine relies on:
applying the merge rules SEQUENTIALLY in rank order (each rule
replacing its pair left-to-right, non-overlapping) reproduces the
training tokenization exactly. That equivalence holds for any table
this trainer emits because a rule's operands are only ever produced
by strictly earlier rules, so later rules can never create a new
occurrence of an earlier rule's pair.

Usage: python scripts/train_bpe.py [n_merges] [sf_dir]
"""

from __future__ import annotations

import collections
import sys

import duckdb


def train(sf_dir: str = "/root/testdata/sf0.001", n_merges: int = 24):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    freq = collections.Counter(w for (w,) in rows)
    words = {w: list(w) for w in freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, seq in words.items():
            f = freq[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, seq in words.items():
            words[w] = _merge_pass(seq, a, b)
    return merges, words, freq


def _merge_pass(seq: list[str], a: str, b: str) -> list[str]:
    """One left-to-right, non-overlapping replacement of (a, b) -> a+b."""
    out: list[str] = []
    i = 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def infer(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Rank-order sequential inference — the algorithm both engines run."""
    seq = list(word)
    for a, b in merges:
        seq = _merge_pass(seq, a, b)
    return seq


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    merges, words, freq = train(sf, n)
    print("BPE_MERGES = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")
    bad = {w: (infer(w, merges), t) for w, t in words.items() if infer(w, merges) != t}
    assert not bad, f"rank-order inference != training tokenization: {bad}"
    print(f"# {len(words)} words, {sum(freq.values())} occurrences; "
          "rank-order inference == training tokenization: OK")
