#!/usr/bin/env python
"""Build the pinned wordpiece vocab artifact (deepref_spark/data/wp_vocab.txt).

A deterministic stand-in for a trained WordPiece vocab (the reference
loads one via load_vocab, deepref/tokenization/word_piece_tokenizer.py:36;
no trained vocab file ships in this environment): pieces are selected by
frequency x (length - 1) over the corpus token distribution — the same
"keep substrings that save the most symbol emissions" objective WordPiece
training optimizes greedily. Start-anchored occurrences score the bare
piece, interior occurrences the '##' continuation, exactly matching how
greedy matching will consume them.

Layout (one piece per line, like a real vocab file):
  1. special tokens ([PAD]/[UNK]/[CLS]/[SEP]/[MASK]/[unused0..7]) — ids
     still come from refsem.piece_to_id's pinned map, not line numbers;
  2. the full single-char alphabet + '##' forms (guarantees is_bad only
     fires on out-of-alphabet chars, the same guarantee a trained BERT
     vocab gives via its character fallback);
  3. the vendored tokenizer's docstring example pieces (un/##aff/##able,
     word_piece_tokenizer.py:45-47) so the reference golden holds;
  4. the top-scored corpus substrings up to VOCAB_SIZE lines.

Deterministic: fixed corpus file, fixed tie-break (score desc, piece
asc). Rerunning must be a no-op diff.

VOCAB_SIZE is a CAP, not a quota: only corpus-attested substrings are
emitted (WordPiece training never invents pieces), and the sandbox's
synthetic corpus yields ~900. The file is the standard one-piece-per-
line vocab.txt format, so a production deployment drops in a real
trained vocab (e.g. bert-base-uncased's 30,522-line vocab.txt)
unchanged via refsem.load_wp_vocab(path).
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VOCAB_SIZE = 30_000
MAX_PIECE = 8
CORPUS = "/root/testdata/sf0.1/documents.parquet"
OUT = Path(__file__).resolve().parents[1] / "deepref_spark" / "data" / "wp_vocab.txt"

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789(),."
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"[unused{i}]" for i in range(8)
]
SEED_PIECES = ["un", "##aff", "##able"]  # word_piece_tokenizer.py:45-47 example


def norm_tokens(text: str) -> list[str]:
    """Python twin of portable.norm_text/norm_tokens (lowercase, kept
    punctuation isolated, everything else non-alphanumeric stripped)."""
    t = text.lower()
    for ch in ".,()":
        t = t.replace(ch, f" {ch} ")
    t = re.sub(r"[^a-z0-9(),. ]", " ", t)
    return [w for w in t.split() if w]


def word_frequencies() -> Counter:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(f"SELECT text FROM read_parquet('{CORPUS}')").fetchall()
    freq: Counter = Counter()
    for (text,) in rows:
        freq.update(norm_tokens(text))
    # the synthetic pipeline corpus shares this vocab space
    try:
        from deepref_spark import synth

        for w in getattr(synth, "WORDS", []):
            freq[w] += 1
    except Exception:
        pass
    return freq


def score_pieces(freq: Counter) -> Counter:
    """score[piece] = sum over occurrences of freq(word) * (len-1):
    the symbol emissions greedy matching saves by having the piece."""
    scores: Counter = Counter()
    for word, f in freq.items():
        n = len(word)
        for i in range(n):
            for j in range(i + 2, min(n, i + MAX_PIECE) + 1):
                piece = word[i:j]
                key = piece if i == 0 else "##" + piece
                scores[key] += f * (j - i - 1)
    return scores


def main() -> None:
    freq = word_frequencies()
    scores = score_pieces(freq)
    base = SPECIALS + list(ALPHABET) + ["##" + c for c in ALPHABET] + SEED_PIECES
    seen = set(base)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    out = list(base)
    for piece, _ in ranked:
        if len(out) >= VOCAB_SIZE:
            break
        if piece not in seen:
            seen.add(piece)
            out.append(piece)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text("\n".join(out) + "\n")
    print(f"wrote {len(out)} pieces to {OUT}")


if __name__ == "__main__":
    main()
