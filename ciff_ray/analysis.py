"""Pluggable term analyzers — the tokenizer-stage extension hook
SURVEY.md §2.10 promises ("UDF hook ... for the tokenizer stage").

The reference delegates all text analysis to the exporting application
(its toy fixture's terms — "simpl", "veri", "01" — are Porter stems
produced upstream by Anserini/Lucene; CIFF only documents the pipeline
in the Header description,
/root/reference/proto/common-index-format-v1.proto:31-33).  This
module provides the standard analyzer that fixture implies: the
classic Porter (1980) stemmer, applied AFTER the engine's fixed
lowercase [a-z0-9]+ tokenizer.

Scale shape: analyzers run on the dictionary-encoded UNIQUE terms of a
batch (vocabulary-scale, sublinear in corpus size), never per token —
see tokenizer.token_ids.  doclength is unchanged by stemming (token
positions survive; only identities merge), so collection statistics
keep their invariants.

An index records its analyzer in the manifest; the query engine
applies the same analyzer to query terms, so build and serve can never
disagree.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: the number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_cons = True
    started = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started = True
        elif started and not prev_cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    """The classic Porter (1980) stemmer, steps 1a-5b, as published."""
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4 ("ion" carries the extra *S-or-*T condition; no suffix in
    # _STEP4 overlaps a word ending in "ion", so the else-branch is the
    # longest-match rule for it)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion"):
            stem = w[:-3]
            if _measure(stem) > 1 and stem and stem[-1] in "st":
                w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


ANALYZERS: dict[str, Callable[[str], str]] = {"porter": porter_stem}


def get_analyzer(name: str) -> Callable[[str], str] | None:
    if not name:
        return None
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; known: {sorted(ANALYZERS)}"
        ) from None


def analyze_dictionary(
    dictionary: pa.Array, name: str
) -> tuple[pa.Array, np.ndarray]:
    """Apply analyzer ``name`` to a term DICTIONARY (unique terms):
    returns (new unique dictionary, remap) where old index i maps to
    new index remap[i].  The per-term Python loop is vocabulary-scale
    by construction."""
    fn = get_analyzer(name)
    stems = pa.array(
        [fn(t) for t in dictionary.to_pylist()], type=pa.string()
    )
    enc = pc.dictionary_encode(stems)
    return enc.dictionary, enc.indices.to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
