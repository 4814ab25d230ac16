"""Bit-identity of the minhash signature kernels' arithmetic shortcuts.

The signature kernel's Mersenne fold (_mod_p) and the band-blocked
in-place minima (_sig_minima, r07) must equal the plain int64 reference
expression exactly — signatures feed LSH band keys, so a single differing
bit changes candidate sets."""

from __future__ import annotations

import numpy as np

from sparkbm25.pipeline.dedup import MH_P, _mh_params, _mod_p, _sig_minima


def test_mod_p_equals_modulo_boundaries_and_random():
    # boundary values of the 0 <= y < 2^62 domain (a*x+b with
    # a,b < P = 2^31-1 and x < 2^31 stays under 2^62)
    ys = np.array(
        [0, 1, MH_P - 1, MH_P, MH_P + 1, 2 * MH_P, (1 << 62) - 1,
         (1 << 31), (1 << 31) - 1, (1 << 45) + 12345],
        dtype=np.int64,
    )
    assert np.array_equal(_mod_p(ys), ys % MH_P)
    rng = np.random.default_rng(7)
    y = rng.integers(0, 1 << 62, 100_000, dtype=np.int64)
    assert np.array_equal(_mod_p(y), y % MH_P)


def test_sig_minima_matches_reference_matrix():
    rng = np.random.default_rng(42)
    n_hashes = 18  # odd band tail (9 bands) exercises the 2-row chunking
    A = np.array([a for a, _ in _mh_params(n_hashes)], dtype=np.int64)[:, None]
    Bp = np.array([b for _, b in _mh_params(n_hashes)], dtype=np.int64)[:, None]
    lens = rng.integers(1, 40, 200)
    S = int(lens.sum())
    xs = rng.integers(0, 1 << 31, S, dtype=np.int64)
    starts = (np.cumsum(lens) - lens).astype(np.int64)
    ref = np.minimum.reduceat(_mod_p(A * xs[None, :] + Bp), starts, axis=1)
    got = _sig_minima(xs, starts, A, Bp)
    assert got.dtype == np.int64
    assert np.array_equal(got, ref)


def test_sig_minima_single_shingle_segments():
    # length-1 segments: reduceat's identity-window edge case
    A = np.array([a for a, _ in _mh_params(4)], dtype=np.int64)[:, None]
    Bp = np.array([b for _, b in _mh_params(4)], dtype=np.int64)[:, None]
    xs = np.array([5, 17, (1 << 31) - 1], dtype=np.int64)
    starts = np.array([0, 1, 2], dtype=np.int64)
    ref = np.minimum.reduceat(_mod_p(A * xs[None, :] + Bp), starts, axis=1)
    assert np.array_equal(_sig_minima(xs, starts, A, Bp), ref)


def test_tokenize_flat_arrow_parity():
    """tokenize_flat_arrow's flat stream == per-doc tokenize_py concat,
    on ASCII (arrow path), non-ASCII (fallback path), null and empty."""
    import pandas as pd

    from sparkbm25.analysis import tokenize_flat_arrow, tokenize_py

    cases = [
        "Hello, World! 123", "", None, "  a  b  ", "a1b2",
        "UPPER lower", "x" * 7, "trailing space ", " lead", "0",
    ]
    noascii = cases + ["héllo wörld", "Ёлка 7abc"]
    for batch in (cases, noascii, [], [None, ""], ["...", "--"]):
        flat, lens = tokenize_flat_arrow(pd.Series(batch, dtype=object))
        toks = flat.to_pylist()
        assert len(lens) == len(batch)
        i = 0
        for s, n in zip(batch, lens):
            exp = tokenize_py(s)
            assert toks[i:i + int(n)] == exp, (s, toks[i:i + int(n)], exp)
            i += int(n)
        assert i == len(toks)
