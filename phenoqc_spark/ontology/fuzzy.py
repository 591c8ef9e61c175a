"""Fuzzy string scoring with rapidfuzz ``fuzz.WRatio`` semantics.

The reference resolves unmapped terms with
``rapidfuzz.process.extractOne(term, keys, scorer=fuzz.WRatio,
score_cutoff=threshold, processor=None)`` (reference:
src/phenoqc/mapping.py:365-371).  rapidfuzz is a C extension that is not
available in every runtime, so this module provides:

* the real rapidfuzz scorer when importable (production path — at cluster
  scale you want the SIMD `process.cdist` inside the Arrow UDF), and
* a pure-Python reimplementation of the published WRatio algorithm
  (Indel ratio + token_sort/token_set + partial variants with the standard
  0.95 / 0.9 / 0.6 scale factors) used as a deterministic fallback.

The fallback's Indel distance uses the bit-parallel LCS algorithm
(Hyyrö 2004) on arbitrary-precision ints, so it is O(n·m/64) for any
pattern length.  ``extract_one`` preserves rapidfuzz tie-breaking: first
key (in insertion order) achieving the maximum score wins.
"""

from __future__ import annotations

from functools import lru_cache

try:  # pragma: no cover - exercised only where rapidfuzz exists
    from rapidfuzz import fuzz as _rf_fuzz
    from rapidfuzz import process as _rf_process

    HAVE_RAPIDFUZZ = True
except Exception:  # pragma: no cover
    _rf_fuzz = None
    _rf_process = None
    HAVE_RAPIDFUZZ = False


# ---------------------------------------------------------------------------
# Indel distance / ratio (pure python, bit-parallel LCS)
# ---------------------------------------------------------------------------

def _char_masks(pattern: str) -> dict:
    masks: dict = {}
    bit = 1
    for ch in pattern:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def lcs_length(s1: str, s2: str) -> int:
    """Length of the longest common subsequence (bit-parallel)."""
    m = len(s1)
    if m == 0 or len(s2) == 0:
        return 0
    masks = _char_masks(s1)
    full = (1 << m) - 1
    S = full
    for ch in s2:
        M = masks.get(ch, 0)
        u = S & M
        S = ((S + u) | (S - u)) & full
    # zeros in S mark matched pattern positions
    return m - bin(S).count("1")


def indel_distance(s1: str, s2: str) -> int:
    return len(s1) + len(s2) - 2 * lcs_length(s1, s2)


def indel_ratio(s1: str, s2: str) -> float:
    """rapidfuzz ``fuzz.ratio``: normalized Indel similarity in [0, 100]."""
    total = len(s1) + len(s2)
    if total == 0:
        return 100.0
    return 100.0 * (total - indel_distance(s1, s2)) / total


# ---------------------------------------------------------------------------
# partial / token variants (fuzzywuzzy/rapidfuzz published algorithms)
# ---------------------------------------------------------------------------

def partial_ratio(s1: str, s2: str) -> float:
    """Best Indel ratio of the shorter string vs. equal-length windows of
    the longer one (sliding-window definition of fuzz.partial_ratio)."""
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    if not s1:
        return 0.0
    m, n = len(s1), len(s2)
    if m == n:
        return indel_ratio(s1, s2)
    best = 0.0
    masks = _char_masks(s1)
    full = (1 << m) - 1
    # score every window with one bit-parallel pass each
    for start in range(0, n - m + 1):
        S = full
        window = s2[start : start + m]
        for ch in window:
            M = masks.get(ch, 0)
            u = S & M
            S = ((S + u) | (S - u)) & full
        lcs = m - bin(S).count("1")
        score = 100.0 * lcs / m  # equal lengths: (2m - 2(m-lcs))/2m
        if score > best:
            best = score
            if best == 100.0:
                break
    return best


def _tokens(s: str):
    return s.split()


def token_sort_ratio(s1: str, s2: str) -> float:
    return indel_ratio(" ".join(sorted(_tokens(s1))), " ".join(sorted(_tokens(s2))))


def token_set_ratio(s1: str, s2: str) -> float:
    t1, t2 = set(_tokens(s1)), set(_tokens(s2))
    if not t1 or not t2:
        return 0.0
    sect = t1 & t2
    diff1 = sorted(t1 - t2)
    diff2 = sorted(t2 - t1)
    if sect and (not diff1 or not diff2):
        return 100.0
    sect_s = " ".join(sorted(sect))
    s1_full = (sect_s + " " + " ".join(diff1)).strip()
    s2_full = (sect_s + " " + " ".join(diff2)).strip()
    scores = [indel_ratio(s1_full, s2_full)]
    if sect_s:
        scores.append(indel_ratio(sect_s, s1_full))
        scores.append(indel_ratio(sect_s, s2_full))
    return max(scores)


def token_ratio(s1: str, s2: str) -> float:
    return max(token_sort_ratio(s1, s2), token_set_ratio(s1, s2))


def partial_token_ratio(s1: str, s2: str) -> float:
    srt1 = " ".join(sorted(_tokens(s1)))
    srt2 = " ".join(sorted(_tokens(s2)))
    best = partial_ratio(srt1, srt2)
    t1, t2 = set(_tokens(s1)), set(_tokens(s2))
    if t1 and t2:
        sect = t1 & t2
        if sect:
            return 100.0
        d1 = " ".join(sorted(t1 - t2))
        d2 = " ".join(sorted(t2 - t1))
        if d1 and d2:
            best = max(best, partial_ratio(d1, d2))
    return best


def wratio(s1: str, s2: str) -> float:
    """Pure-Python fuzz.WRatio (weighted ratio), rapidfuzz semantics."""
    if not s1 or not s2:
        return 0.0
    len1, len2 = len(s1), len(s2)
    len_ratio = max(len1, len2) / min(len1, len2)
    end_ratio = indel_ratio(s1, s2)
    UNBASE = 0.95
    if len_ratio < 1.5:
        return max(end_ratio, token_ratio(s1, s2) * UNBASE)
    partial_scale = 0.9 if len_ratio < 8 else 0.6
    end_ratio = max(end_ratio, partial_ratio(s1, s2) * partial_scale)
    return max(end_ratio, partial_token_ratio(s1, s2) * UNBASE * partial_scale)


def score(s1: str, s2: str) -> float:
    if HAVE_RAPIDFUZZ:  # pragma: no cover
        return _rf_fuzz.WRatio(s1, s2, processor=None)
    return wratio(s1, s2)


# ---------------------------------------------------------------------------
# extractOne over an ordered key list
# ---------------------------------------------------------------------------

def _bag(s: str) -> dict:
    b: dict = {}
    for ch in s:
        b[ch] = b.get(ch, 0) + 1
    return b


def _bag_common(b1: dict, b2: dict) -> int:
    if len(b2) < len(b1):
        b1, b2 = b2, b1
    return sum(min(n, b2.get(ch, 0)) for ch, n in b1.items())


def _str_stats(s: str):
    """(len, token_set, bag, sorted_len, sorted_bag, uniq_len, uniq_bag)
    for the WRatio upper bound: the original string, its token-sorted
    join (token_sort/partial_token operand), and its unique-token join
    (token_set/diff operand)."""
    toks = s.split()
    ks = " ".join(sorted(toks))
    ku = " ".join(sorted(set(toks)))
    bag = _bag(s)
    return (
        len(s),
        set(toks),
        bag,
        len(ks),
        bag if ks == s else _bag(ks),
        len(ku),
        bag if ku == s else _bag(ku),
    )


def build_key_stats(keys):
    """Precomputed :func:`_str_stats` per key (None for empty keys) —
    built once per process by the resolver so the 50k-key scan prunes
    with O(distinct-chars) bag math instead of full WRatio."""
    return [(_str_stats(k) if k else None) for k in keys]


def _wratio_upper_bound(q, k) -> float:
    """Provable upper bound on wratio(s1, s2) from character-bag overlap.

    Every WRatio component is an Indel ratio of (rearrangements /
    windows / token-subset joins) of the two strings, and an Indel
    ratio is 200·LCS/(l1+l2) with LCS ≤ the character-multiset
    intersection of its operands — so each component is bounded by bag
    overlap over the operands it actually compares:

    - ratio: 200·C/(l1+l2) on the originals;
    - token_sort: same on the token-sorted joins (multiset preserved);
    - token_set: 100 iff a token is shared (the sect shortcut),
      else the diff strings are the unique-token joins → bound there;
    - partial_*: each window's LCS ≤ C and score = 100·LCS/m with m
      the shorter operand.

    WRatio's own 0.95/0.9/0.6 scale factors and length-ratio branches
    are applied exactly as in :func:`wratio`.
    """
    (lq, tq, bq, lsq, bsq, luq, buq) = q
    (lk, tk, bk, lsk, bsk, luk, buk) = k
    c = _bag_common(bq, bk)
    r = 200.0 * c / (lq + lk)
    shared = not tq.isdisjoint(tk)
    lo, hi = (lq, lk) if lq <= lk else (lk, lq)
    if hi < 1.5 * lo:
        ts_sort = (
            200.0 * _bag_common(bsq, bsk) / (lsq + lsk) if lsq + lsk else 0.0
        )
        if shared:
            tok = 100.0
        elif luq and luk:
            tok = max(ts_sort, 200.0 * _bag_common(buq, buk) / (luq + luk))
        else:
            tok = ts_sort
        return max(r, 0.95 * tok)
    sc = 0.9 if hi < 8 * lo else 0.6
    pr = 100.0 * min(c, lo) / lo
    if shared:
        pt = 100.0
    else:
        ms = min(lsq, lsk)
        mu = min(luq, luk)
        pt = max(
            100.0 * min(_bag_common(bsq, bsk), ms) / ms if ms else 0.0,
            100.0 * min(_bag_common(buq, buk), mu) / mu if mu else 0.0,
        )
    return max(r, sc * pr, 0.95 * sc * pt)


class KeyIndex:
    """Vectorized per-key stats for the character-bag WRatio bound.

    Dense numpy count matrices over the keys' charset, one per WRatio
    operand variant (original / token-sorted join / unique-token join),
    plus a token→keys inverted index for the token_set 100-shortcut.
    :meth:`bounds` evaluates :func:`_wratio_upper_bound`'s exact branch
    math for ALL keys in one numpy pass — at 50k keys this turns the
    857 ms/query pure-Python bound scan into ~2 ms (BENCH/PR.md), while
    :func:`extract_one` results stay bit-identical (the numpy bound is
    the same rational-in-float arithmetic, tested equal to the scalar
    to 1e-9 in tests/test_properties.py).

    Built once per worker process by the resolver (excluded from the
    broadcast pickle — mapper.TermResolver.__getstate__).
    """

    def __init__(self, keys):
        import numpy as np

        n = len(keys)
        char_ix: dict = {}
        tok_ix: dict = {}
        rows = []  # (bags triple) per key, None for empty keys
        self.valid = np.zeros(n, dtype=bool)
        l0 = np.ones(n, dtype=np.int64)
        l1 = np.ones(n, dtype=np.int64)
        l2 = np.ones(n, dtype=np.int64)
        for i, k in enumerate(keys):
            if not k:
                rows.append(None)
                continue
            self.valid[i] = True
            toks = k.split()
            ks = " ".join(sorted(toks))
            ku = " ".join(sorted(set(toks)))
            l0[i], l1[i], l2[i] = len(k), len(ks), len(ku)
            b0 = _bag(k)
            b1 = b0 if ks == k else _bag(ks)
            b2 = b0 if ku == k else _bag(ku)
            rows.append((b0, b1, b2))
            for b in (b0, b1, b2):
                for ch in b:
                    if ch not in char_ix:
                        char_ix[ch] = len(char_ix)
            for t in set(toks):
                tok_ix.setdefault(t, []).append(i)
        C = len(char_ix)
        m0 = np.zeros((n, C), dtype=np.int32)
        m1 = np.zeros((n, C), dtype=np.int32)
        m2 = np.zeros((n, C), dtype=np.int32)
        for i, r in enumerate(rows):
            if r is None:
                continue
            for m, b in zip((m0, m1, m2), r):
                for ch, cnt in b.items():
                    m[i, char_ix[ch]] = cnt
        self.char_ix = char_ix
        self.tok_ix = {t: np.asarray(ix, dtype=np.int64) for t, ix in tok_ix.items()}
        self.m0, self.m1, self.m2 = m0, m1, m2
        self.l0, self.l1, self.l2 = l0, l1, l2

    @staticmethod
    def _common(mat, char_ix, bag):
        import numpy as np

        cols, counts = [], []
        for ch, cnt in bag.items():
            j = char_ix.get(ch)
            if j is not None:
                cols.append(j)
                counts.append(cnt)
        if not cols:
            return np.zeros(mat.shape[0], dtype=np.int64)
        sub = mat[:, cols]
        q = np.asarray(counts, dtype=np.int32)
        return np.minimum(sub, q).sum(axis=1, dtype=np.int64)

    def bounds(self, qstat):
        """Vector of :func:`_wratio_upper_bound` over all keys (−1 for
        empty keys) — same branch math, element-wise."""
        import numpy as np

        (lq, tq, bq, lsq, bsq, luq, buq) = qstat
        c0 = self._common(self.m0, self.char_ix, bq)
        c1 = self._common(self.m1, self.char_ix, bsq)
        c2 = self._common(self.m2, self.char_ix, buq)
        l0, l1, l2 = self.l0, self.l1, self.l2
        shared = np.zeros(len(l0), dtype=bool)
        for t in tq:
            ix = self.tok_ix.get(t)
            if ix is not None:
                shared[ix] = True
        r = 200.0 * c0 / (lq + l0)
        lo = np.minimum(lq, l0)
        hi = np.maximum(lq, l0)
        # branch 1: hi < 1.5*lo
        den1 = lsq + l1
        ts_sort = np.where(den1 > 0, 200.0 * c1 / np.maximum(den1, 1), 0.0)
        den2 = luq + l2
        uniq = np.where(den2 > 0, 200.0 * c2 / np.maximum(den2, 1), 0.0)
        uniq_ok = (luq > 0) & (l2 > 0)
        tok = np.where(
            shared, 100.0, np.where(uniq_ok, np.maximum(ts_sort, uniq), ts_sort)
        )
        b1 = np.maximum(r, 0.95 * tok)
        # branch 2
        sc = np.where(hi < 8 * lo, 0.9, 0.6)
        pr = 100.0 * np.minimum(c0, lo) / lo
        ms = np.minimum(lsq, l1)
        mu = np.minimum(luq, l2)
        pt_s = np.where(ms > 0, 100.0 * np.minimum(c1, ms) / np.maximum(ms, 1), 0.0)
        pt_u = np.where(mu > 0, 100.0 * np.minimum(c2, mu) / np.maximum(mu, 1), 0.0)
        pt = np.where(shared, 100.0, np.maximum(pt_s, pt_u))
        b2 = np.maximum(r, np.maximum(sc * pr, 0.95 * sc * pt))
        out = np.where(hi < 1.5 * lo, b1, b2)
        return np.where(self.valid, out, -1.0)


def build_key_index(keys) -> KeyIndex:
    """Vectorized twin of :func:`build_key_stats` — same prune contract,
    numpy-batched bound evaluation (see :class:`KeyIndex`)."""
    return KeyIndex(keys)


def extract_one(query: str, keys, score_cutoff: float, key_stats=None):
    """First key (insertion order) with the maximum WRatio ≥ cutoff, or None.

    Matches ``rapidfuzz.process.extractOne`` tie-breaking: later keys must
    *strictly* beat the current best to replace it, so with preserved OBO
    term order the chosen key (and thus the mapped id) is identical to the
    reference (SURVEY.md §7.4 risk 1).

    ``key_stats`` (from :func:`build_key_stats`) enables the character-bag
    upper-bound prune — at HPO dictionary scale (50k keys) this is the
    difference between ~50k full WRatio evaluations per distinct
    unmatched surface and a handful (measured 5.3× end-to-end, 7.2× on
    the fuzzy-tier overhead, on the 1M-page pipeline — BENCH/PR.md):
    the earlier length-ratio caps (95/90) never fired at the standard
    cutoff of 80.  The bound only
    SKIPS keys that provably cannot reach max(cutoff, best), so the
    returned (key, score) is bit-identical with and without stats.
    """
    if not query:
        return None
    if HAVE_RAPIDFUZZ:  # pragma: no cover
        res = _rf_process.extractOne(
            query, keys, scorer=_rf_fuzz.WRatio, score_cutoff=score_cutoff, processor=None
        )
        return None if res is None else (res[0], float(res[1]))
    best_key = None
    best_score = -1.0
    qstat = _str_stats(query)
    if isinstance(key_stats, KeyIndex):
        # one numpy pass over all keys, then score the (few) survivors
        # in insertion order — identical tie-break, identical result
        ubs = key_stats.bounds(qstat) + 1e-6
        for i in (ubs >= score_cutoff).nonzero()[0]:
            if ubs[i] <= best_score:
                continue
            key = keys[i]
            s = wratio(query, key)
            if s >= score_cutoff and s > best_score:
                best_key = key
                best_score = s
                if best_score == 100.0:
                    break
        if best_key is None:
            return None
        return (best_key, best_score)
    for i, key in enumerate(keys):
        if not key:
            continue
        kstat = key_stats[i] if key_stats is not None else _str_stats(key)
        # float-safety margin: the bound math is exact rational-in-float,
        # but give wratio a hair of headroom before skipping
        ub = _wratio_upper_bound(qstat, kstat) + 1e-6
        if ub < score_cutoff or ub <= best_score:
            continue
        s = wratio(query, key)
        if s >= score_cutoff and s > best_score:
            best_key = key
            best_score = s
            if best_score == 100.0:
                break
    if best_key is None:
        return None
    return (best_key, best_score)
