"""Pure-numpy differential tests for the flattened reduceat Arrow kernels
(no SparkSession needed): the vectorized forms must reproduce the
row-at-a-time reference math bit-for-bit, including across chunk
boundaries and on None/empty rows."""

from __future__ import annotations

import numpy as np
import pytest

from yaschva_spark.ops import dedup


def _minhash_reference(rows, a, b):
    out = []
    for row in rows:
        h = np.asarray(row, dtype=np.int64).astype(np.uint64)
        mixed = a[:, None] * h[None, :] + b[:, None]  # wraps mod 2^64
        out.append(mixed.min(axis=1).astype(np.int64))
    return out


def _simhash_reference(rows):
    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.uint64)
    out = np.zeros(len(rows), dtype=np.int64)
    for idx, row in enumerate(rows):
        if row is None or len(row) == 0:
            continue  # all-zero fingerprint
        h = np.asarray(row, dtype=np.int64).astype(np.uint64)
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        fp = int((weights * (votes > 0)).sum(dtype=np.uint64))
        out[idx] = fp - 2**64 if fp >= 2**63 else fp
    return out


def _rand_rows(rng, n_rows, allow_empty=False):
    rows = []
    for _ in range(n_rows):
        n = int(rng.integers(0 if allow_empty else 1, 40))
        # full signed-int64 range: exercises the uint64 wrap on both kernels
        rows.append(rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64))
    return rows


@pytest.mark.parametrize("seed", range(4))
def test_minhash_mix_matches_row_loop(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63 - 1, size=16, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63 - 1, size=16, dtype=np.uint64)
    rows = _rand_rows(rng, 200)
    got = dedup._minhash_mix(rows, a, b)
    want = _minhash_reference(rows, a, b)
    assert all(np.array_equal(g, w) for g, w in zip(got, want))


def test_minhash_mix_chunk_boundaries(monkeypatch):
    rng = np.random.default_rng(99)
    a = rng.integers(1, 2**63 - 1, size=8, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63 - 1, size=8, dtype=np.uint64)
    rows = _rand_rows(rng, 100)
    want = _minhash_reference(rows, a, b)
    # force many chunks, including single-row chunks wider than the budget
    for chunk in (1, 7, 64):
        monkeypatch.setattr(dedup, "_FLAT_CHUNK", chunk)
        got = dedup._minhash_mix(rows, a, b)
        assert all(np.array_equal(g, w) for g, w in zip(got, want)), chunk


@pytest.mark.parametrize("seed", range(4))
def test_simhash_fingerprints_match_row_loop(seed):
    rng = np.random.default_rng(seed)
    rows = _rand_rows(rng, 200, allow_empty=True)
    rows[0] = None  # null text -> all-zero fingerprint
    assert np.array_equal(dedup._simhash_fingerprints(rows), _simhash_reference(rows))


def test_simhash_fingerprints_chunk_boundaries(monkeypatch):
    rng = np.random.default_rng(5)
    rows = _rand_rows(rng, 100, allow_empty=True)
    want = _simhash_reference(rows)
    for chunk in (1, 7, 64):
        monkeypatch.setattr(dedup, "_FLAT_CHUNK", chunk)
        assert np.array_equal(dedup._simhash_fingerprints(rows), want), chunk
