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

def extract_one(query: str, keys, score_cutoff: float):
    """First key (insertion order) with the maximum WRatio ≥ cutoff, or None.

    Matches ``rapidfuzz.process.extractOne`` tie-breaking: later keys must
    *strictly* beat the current best to replace it, so with preserved OBO
    term order the chosen key (and thus the mapped id) is identical to the
    reference (SURVEY.md §7.4 risk 1).
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
    qlen = len(query)
    for key in keys:
        if not key:
            continue
        # Provably safe upper bound before scoring: the plain-ratio branch is
        # bounded by the length difference (indel ≥ |l1−l2|); the token branch
        # is capped at 95 and the partial branches at 90 / 57 by WRatio's
        # scale factors.  Skip keys that cannot beat (cutoff, current best).
        klen = len(key)
        lo, hi = (qlen, klen) if qlen <= klen else (klen, qlen)
        ratio_ub = 100.0 * (2.0 * lo) / (qlen + klen)
        if hi < 1.5 * lo:
            cap = 95.0
        elif hi < 8 * lo:
            cap = 90.0
        else:
            cap = 60.0
        ub = ratio_ub if ratio_ub > cap else cap
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
