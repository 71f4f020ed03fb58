"""Vectorized XXH64 over a batch of byte strings — numpy only.

Bit-identical to Spark's ``xxhash64`` expression (XXH64, seed 42, over
the UTF-8 bytes): pinned by
``tests/test_dedup_similarity.py::test_xxh64_numpy_bit_identical_to_spark``
against the JVM implementation on random ASCII, unicode, and boundary lengths
(0, 1, 3, 4, 7, 8, 31, 32, 33, 63, 64, 65 bytes — every branch of the
spec). Exists so the Arrow simhash signer can hash a whole batch's
token stream as C-speed array ops instead of per-row JVM codegen
(same pattern as ``minhash_signatures_arrow``: the hash is the only
part of the fingerprint the JVM was still needed for).

Algorithm reference: the public XXH64 spec (Cyan4973/xxHash,
doc/xxhash_spec.md). All arithmetic is mod-2^64 (numpy uint64 wraps
like C); the only subtlety is vectorizing the variable-length control
flow — stripes and tails become masked array ops over a padded
(n, maxlen) byte matrix.
"""

from __future__ import annotations

import numpy as np

P1 = np.uint64(11400714785074694791)
P2 = np.uint64(14029467366897019727)
P3 = np.uint64(1609587929392839161)
P4 = np.uint64(9650029242287828579)
P5 = np.uint64(2870177450012600261)

_ERR = {"over": "ignore"}


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _read_u64(mat: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Little-endian u64 at per-row offsets ``off`` of the padded byte
    matrix (rows must have >= off+8 valid bytes where used)."""
    idx = off[:, None] + np.arange(8, dtype=np.int64)[None, :]
    b = np.take_along_axis(mat, idx, axis=1).astype(np.uint64)
    return (b << (np.arange(8, dtype=np.uint64) * np.uint64(8))[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def _read_u32(mat: np.ndarray, off: np.ndarray) -> np.ndarray:
    idx = off[:, None] + np.arange(4, dtype=np.int64)[None, :]
    b = np.take_along_axis(mat, idx, axis=1).astype(np.uint64)
    return (b << (np.arange(4, dtype=np.uint64) * np.uint64(8))[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def xxh64_batch(
    mat: np.ndarray, lens: np.ndarray, seed: int = 42
) -> np.ndarray:
    """XXH64 of each row of ``mat`` (uint8, zero-padded to a common
    width of at least max(lens) + 8 SLACK BYTES — reads beyond a row's
    length are masked out of the result but must be in-bounds) with
    per-row byte length ``lens``. Returns uint64."""
    with np.errstate(**_ERR):
        n = len(lens)
        lens = lens.astype(np.int64)
        seed = np.uint64(seed)
        h = np.empty(n, dtype=np.uint64)

        long_mask = lens >= 32
        # --- long path: 4 lane accumulators over 32-byte stripes ------
        if long_mask.any():
            li = np.nonzero(long_mask)[0]
            lmat, llen = mat[li], lens[li]
            v1 = np.full(len(li), seed + P1 + P2, dtype=np.uint64)
            v2 = np.full(len(li), seed + P2, dtype=np.uint64)
            v3 = np.full(len(li), seed, dtype=np.uint64)
            v4 = np.full(len(li), seed - P1, dtype=np.uint64)
            n_stripes = llen // 32
            for s in range(int(n_stripes.max())):
                m = n_stripes > s
                off = np.int64(s * 32)
                for lane, v in enumerate((v1, v2, v3, v4)):
                    k = _read_u64(lmat, np.full(len(li), off + 8 * lane))
                    nv = _rotl(v + k * P2, 31) * P1
                    np.copyto(v, nv, where=m)
            acc = (
                _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            )
            for v in (v1, v2, v3, v4):
                acc ^= _rotl(v * P2, 31) * P1
                acc = acc * P1 + P4
            h[li] = acc
        # --- short path init -----------------------------------------
        short = ~long_mask
        h[short] = seed + P5
        h += lens.astype(np.uint64)

        # --- tail: 8-byte words --------------------------------------
        tail_start = (lens // 32) * 32
        rem = lens - tail_start
        n_words = rem // 8
        for w in range(int(n_words.max()) if n else 0):
            m = n_words > w
            off = tail_start + 8 * w
            k = _read_u64(mat, np.where(m, off, 0))
            nh = _rotl(h ^ (_rotl(k * P2, 31) * P1), 27) * P1 + P4
            np.copyto(h, nh, where=m)
        # --- tail: one 4-byte word ------------------------------------
        off4 = tail_start + n_words * 8
        has4 = (lens - off4) >= 4
        if has4.any():
            k = _read_u32(mat, np.where(has4, off4, 0))
            nh = _rotl(h ^ (k * P1), 23) * P2 + P3
            np.copyto(h, nh, where=has4)
            off4 = off4 + np.where(has4, 4, 0)
        # --- tail: bytes ----------------------------------------------
        n_bytes = lens - off4
        for b in range(int(n_bytes.max()) if n else 0):
            m = n_bytes > b
            idx = np.where(m, off4 + b, 0)
            byte = np.take_along_axis(mat, idx[:, None], axis=1)[:, 0].astype(
                np.uint64
            )
            nh = _rotl(h ^ (byte * P5), 11) * P1
            np.copyto(h, nh, where=m)

        # --- avalanche -------------------------------------------------
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
        return h


def xxh64_strings(tokens: list[bytes], seed: int = 42) -> np.ndarray:
    """Hash a python list of byte strings (helper for tests and small
    batches): pads into the matrix form and returns int64 (Spark's
    signed view of the uint64 hash)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    width = int(lens.max()) + 8  # slack so masked reads stay in-bounds
    mat = np.zeros((n, width), dtype=np.uint8)
    for i, t in enumerate(tokens):
        if t:
            mat[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    return xxh64_batch(mat, lens, seed).view(np.int64)
