"""Subword tokenization: greedy longest-match WordPiece over a
broadcast vocabulary.

The missing piece between this engine's token COUNTING (text.py's
whitespace/BPE-ish regex estimators) and a training pipeline's real
token budget: apply an actual subword vocabulary so lengths, packing
budgets (sampling.pack_sequences) and chunk windows
(sampling.chunk_documents) line up with what the model will see.

Greedy longest-match (the WordPiece inference algorithm — BERT-style
``##`` continuation pieces) rather than BPE merge-replay: inference
only needs the final vocabulary, matches in O(word_len²) against a
hash set, and is deterministic. Iterative BPE merge application would
need the ordered merges list and gives the same result for a
consistent vocab.

Scale: the vocab is a plain Python set broadcast once via the Arrow
UDF closure (100k pieces ≈ a few MB — the standard size); the kernel
is ``mapInPandas`` (Arrow-batched, one pass per partition, no
shuffle). This is the documented Python path: per-character
longest-match has no Column-expression equivalent.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def wordpiece_pieces(word: str, vocab: set[str],
                     unk: str = "[UNK]", cont: str = "##") -> list[str]:
    """Greedy longest-match split of one word; whole word -> [UNK] when
    any position has no matching piece."""
    pieces: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else cont + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [unk]
        pieces.append(piece)
        i = j
    return pieces


def wordpiece_tokenize(
    df: DataFrame,
    vocab: Iterable[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_tokens: str = "tokens",
    out_count: str = "n_tokens",
    lowercase: bool = True,
    unk: str = "[UNK]",
) -> DataFrame:
    """Tokenize ``text_col`` into subword pieces: pre-split on
    non-alphanumeric (the corpus-wide tokenizer convention shared with
    text.vocabulary / lm.py), then greedy longest-match each word
    against ``vocab``. Returns (id_col, tokens array, n_tokens)."""
    vocab_set = set(vocab)
    if not vocab_set:
        raise ValueError("vocab must be non-empty")

    import re

    split_re = re.compile(r"[^a-z0-9]+" if lowercase else r"[^A-Za-z0-9]+")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col].astype(object):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    toks.append([])
                    counts.append(0)
                    continue
                t = text.lower() if lowercase else text
                pieces: list[str] = []
                for w in split_re.split(t):
                    if w:
                        pieces.extend(wordpiece_pieces(w, vocab_set, unk))
                toks.append(pieces)
                counts.append(len(pieces))
            yield pd.DataFrame({id_col: pdf[id_col],
                                out_tokens: toks,
                                out_count: counts})

    # id column keeps the frame's own type (a hardcoded long would make
    # a string- or int32-keyed corpus fail Arrow schema validation)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_type}, {out_tokens} array<string>, "
              f"{out_count} int")
    return df.select(id_col, text_col).mapInPandas(_run, schema=schema)


def vocab_from_corpus(
    df: DataFrame,
    text_col: str = "text",
    max_word_pieces: int = 2000,
    min_count: int = 2,
) -> list[str]:
    """A cheap corpus-driven piece vocabulary for tests/bootstrap:
    the ``max_word_pieces`` most frequent whole words (plus their
    single-char fallbacks, whole and ``##``-continuation) — NOT a
    learned BPE/WordPiece training run, just enough structure for the
    greedy matcher never to hit [UNK] on frequent text. Driver-side
    list; feed real model vocabs in production."""
    from goetl_spark.operators.text import vocabulary

    top = (vocabulary(df, text_col=text_col)
           .where(F.col("n") >= min_count)
           .orderBy(F.desc("n"), "token")
           .limit(max_word_pieces)
           .collect())
    vocab = {r["token"] for r in top}
    chars = {c for w in vocab for c in w}
    vocab |= chars | {"##" + c for c in chars}
    return sorted(vocab)
