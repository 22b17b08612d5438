"""Deterministic Zipfian text fixture (VERDICT r2 #5).

The driver's synthetic documents corpus has a FLAT shingle
document-frequency distribution, which makes the naive candidate join
look unconditionally right; natural web text is Zipfian with shared
boilerplate (headers, footers, licenses) — a few shingles with df
approaching n that quadratically inflate the naive self-join. This
generator reproduces that regime on demand: i.i.d. Zipf(s) words over a
synthetic vocabulary, an optional boilerplate header shared by
``boiler_frac`` of the corpus, and a 5% clone tail (one random word
swapped) so near-dup queries return non-empty output. Fully seeded —
identical corpus on every run and every machine.
"""

from __future__ import annotations

import numpy as np


def zipf_rows(
    n_docs: int,
    *,
    vocab_size: int = 2000,
    zipf_s: float = 1.1,
    boiler_frac: float = 0.0,
    header_words: int = 20,
    clone_frac: float = 0.05,
    seed: int = 7,
) -> list[tuple[int, str]]:
    """(doc_id, text) rows; clone ids start at 100000."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, vocab_size + 1) ** zipf_s
    w /= w.sum()
    vocab = [f"w{i}" for i in range(vocab_size)]
    header = " ".join(
        vocab[int(rng.integers(0, vocab_size))] for _ in range(header_words)
    )
    rows: list[tuple[int, str]] = []
    for i in range(n_docs):
        n_words = int(rng.integers(40, 120))
        text = " ".join(vocab[x] for x in rng.choice(vocab_size, size=n_words, p=w))
        if rng.random() < boiler_frac:
            text = header + " " + text
        rows.append((i, text))
    for k in range(int(n_docs * clone_frac)):
        _, text = rows[int(rng.integers(0, n_docs))]
        words = text.split(" ")
        words[int(rng.integers(0, len(words)))] = vocab[int(rng.integers(0, vocab_size))]
        rows.append((100000 + k, " ".join(words)))
    return rows


def zipf_corpus(spark, n_docs: int, **kw):
    """The rows as a 32-partition DataFrame (doc_id long, text string)."""
    return spark.createDataFrame(
        zipf_rows(n_docs, **kw), "doc_id long, text string"
    ).repartition(32)
