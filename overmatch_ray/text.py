"""Fuzzy string similarity — exact reimplementation of ``fuzz.ratio``.

The reference gates every conflation match on
``fuzz.ratio(osm_name, cand_name) / 100 >= 0.6``
(/root/reference/scripts/match.py:242-244). ``fuzz.ratio`` (rapidfuzz) is the
normalized InDel similarity:

    ratio(a, b) = 100 * 2 * LCS(a, b) / (len(a) + len(b))

where LCS is the longest common subsequence (insertions/deletions only; a
substitution costs 2). We reimplement it from the published algorithm
(Allison & Dix 1986 bit-parallel LCS), both as a scalar (arbitrary length,
Python big-ints) and as a numpy-vectorized kernel over pair arrays for the
hot matcher path (strings ≤64 chars per word; longer pairs fall back to the
scalar). Verified against an O(n·m) DP in tests.
"""

from __future__ import annotations

import numpy as np

_POPCNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def lcs_length(a: str, b: str) -> int:
    """Bit-parallel LCS length (Allison–Dix), arbitrary-length via big ints."""
    if not a or not b:
        return 0
    masks: dict[str, int] = {}
    for i, ch in enumerate(a):
        masks[ch] = masks.get(ch, 0) | (1 << i)
    width_mask = (1 << len(a)) - 1
    row = 0
    for ch in b:
        x = row | masks.get(ch, 0)
        y = x - ((row << 1) | 1)
        row = (x & ~y) & width_mask
    return bin(row).count("1")


def ratio(a: str, b: str) -> float:
    """fuzz.ratio-compatible similarity in [0, 100]."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 100.0
    return 200.0 * lcs_length(a, b) / (la + lb)


def _encode_padded(names: np.ndarray, maxlen: int, sentinel: int) -> tuple[np.ndarray, np.ndarray]:
    """Strings → (n, maxlen) uint32 codepoint matrix + length vector."""
    n = len(names)
    out = np.full((n, maxlen), sentinel, dtype=np.uint32)
    lens = np.empty(n, dtype=np.int64)
    for i, s in enumerate(names):
        s = s if isinstance(s, str) else ("" if s is None else str(s))
        ls = min(len(s), maxlen)
        lens[i] = len(s)
        if ls:
            out[i, :ls] = np.frombuffer(s[:ls].encode("utf-32-le"), dtype=np.uint32)
    return out, lens


def _norm_str(s) -> str:
    # the exact normalization _encode_padded applies (None → "", else str)
    return s if isinstance(s, str) else ("" if s is None else str(s))


def _ratio_pairs_native(names_a, names_b, fast_idx, la_all, lb_all,
                        out) -> None:
    """Compiled fast path (imaging/_native.c om_lcs_pairs): one UTF-32
    encode of the concatenated fast-pair strings, then the integer
    bit-parallel LCS per pair in C. The ratio division runs in numpy with
    the SAME expression as the lane kernel, so outputs are bit-identical
    (parity-tested in tests/test_native_parity.py)."""
    from .imaging import native as _native

    sa = [_norm_str(names_a[i]) for i in fast_idx]
    sb = [_norm_str(names_b[i]) for i in fast_idx]
    codes = np.frombuffer(
        ("".join(sa) + "".join(sb)).encode("utf-32-le"), dtype=np.uint32
    )
    # normalized lengths — the lane kernel's denominators come from
    # _encode_padded's lens (post str()/None normalization), not la_all
    la = np.fromiter((len(s) for s in sa), np.int64, fast_idx.size)
    lb = np.fromiter((len(s) for s in sb), np.int64, fast_idx.size)
    a_off = np.concatenate([[0], np.cumsum(la)])
    b_off = a_off[-1] + np.concatenate([[0], np.cumsum(lb)])
    m = fast_idx.size
    lcs = np.zeros(m, dtype=np.int64)
    codes = np.ascontiguousarray(codes)
    a_off = np.ascontiguousarray(a_off[:-1])
    b_off2 = np.ascontiguousarray(b_off[:-1])
    la_c = np.ascontiguousarray(la)
    lb_c = np.ascontiguousarray(lb)
    _native.LIB.om_lcs_pairs(
        codes.ctypes.data, a_off.ctypes.data, b_off2.ctypes.data,
        la_c.ctypes.data, lb_c.ctypes.data, m, lcs.ctypes.data,
    )
    denom = (la + lb).astype(np.float64)
    out[fast_idx] = np.where(
        denom > 0, 200.0 * lcs.astype(np.float64) / np.maximum(denom, 1.0),
        100.0,
    )


def ratio_pairs(names_a, names_b, chunk: int = 4096) -> np.ndarray:
    """Vectorized ``ratio`` over aligned pair arrays → float64 in [0, 100].

    The matcher's hot kernel: one call per candidate-pair batch instead of a
    Python call per pair. Pairs where either side exceeds 64 chars use the
    exact scalar fallback. With the compiled kernel available the ≤64-char
    pairs run through C (``_ratio_pairs_native``); the numpy lane kernel
    below is the reference implementation and permanent fallback.
    """
    names_a = np.asarray(names_a, dtype=object)
    names_b = np.asarray(names_b, dtype=object)
    n = len(names_a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out

    la_all = np.fromiter(
        (len(s) if isinstance(s, str) else 0 for s in names_a), np.int64, n
    )
    lb_all = np.fromiter(
        (len(s) if isinstance(s, str) else 0 for s in names_b), np.int64, n
    )
    fast = (la_all <= 64) & (lb_all <= 64)
    slow_idx = np.nonzero(~fast)[0]
    for i in slow_idx:
        out[i] = ratio(str(names_a[i]), str(names_b[i]))

    fast_idx = np.nonzero(fast)[0]
    if fast_idx.size:
        from .imaging import codec as _codec

        if _codec._use_native():
            _ratio_pairs_native(names_a, names_b, fast_idx, la_all, lb_all,
                                out)
            return out
    pow2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    ones = np.uint64(1)
    for s in range(0, fast_idx.size, chunk):
        sel = fast_idx[s : s + chunk]
        a_mat, la = _encode_padded(names_a[sel], 64, 0xFFFFFFFF)
        b_mat, lb = _encode_padded(names_b[sel], 64, 0xFFFFFFFE)
        m = sel.size
        lbmax = int(lb.max(initial=0))
        lamax = int(la.max(initial=0))
        a_mat = a_mat[:, :max(lamax, 1)]
        # width mask: keep only the len(a) low bits of the DP row
        wmask = np.where(
            la >= 64,
            np.uint64(0xFFFFFFFFFFFFFFFF),
            (np.uint64(1) << la.astype(np.uint64)) - ones,
        )
        row = np.zeros(m, dtype=np.uint64)
        # per-position match masks: masks[:, j] = bits of a equal to b[j]
        eq = a_mat[:, None, :] == b_mat[:, :lbmax or 1, None]
        masks = (eq * pow2[None, None, : a_mat.shape[1]]).sum(axis=2, dtype=np.uint64)
        for j in range(lbmax):
            active = j < lb
            x = row | masks[:, j]
            y = x - ((row << ones) | ones)
            new_row = (x & ~y) & wmask
            row = np.where(active, new_row, row)
        lcs = (
            _POPCNT_TABLE[row.view(np.uint8).reshape(m, 8)].sum(axis=1).astype(np.float64)
        )
        denom = (la + lb).astype(np.float64)
        res = np.where(denom > 0, 200.0 * lcs / np.maximum(denom, 1.0), 100.0)
        out[sel] = res
    return out
