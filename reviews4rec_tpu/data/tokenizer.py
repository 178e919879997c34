"""Tokenization + vocabulary construction.

Semantics follow the reference's preprocessing
(`data_scripts/preprocess_random_split.py:30-48` Yoon-Kim-style cleanup,
`:88-118` capped vocab with UNK=0): lowercase, alphanumeric runs only
(punctuation splits and is dropped), ids assigned in first-appearance
order starting at 1, and a frequency cap where only words at least as
frequent as the cap-th most frequent word survive; everything else maps
to UNK (id 0).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Tuple

_TOKEN = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> List[str]:
    """"I LOVED it! Don't you?" -> [i, loved, it, don, t, you]."""
    return _TOKEN.findall(text.lower())


def build_vocab(token_lists: Iterable[List[str]],
                cap: int = 50000) -> Tuple[Dict[str, int], int]:
    """Return (word -> id map incl. UNK=0 entries, number of kept words).

    Ids are assigned in first-appearance order starting at 1. When the
    vocabulary exceeds `cap`, the survival threshold is the count of the
    cap-th most frequent word (reference `get_word_map`,
    preprocess_random_split.py:88-118).
    """
    token_lists = list(token_lists)
    freq: Dict[str, int] = {}
    for lst in token_lists:
        for w in lst:
            freq[w] = freq.get(w, 0) + 1

    if len(freq) > cap:
        thresh = sorted(freq.values(), reverse=True)[cap - 1]
    else:
        thresh = 0

    word_map: Dict[str, int] = {}
    next_id = 1
    for lst in token_lists:
        for w in lst:
            if w in word_map:
                continue
            if freq[w] >= thresh:
                word_map[w] = next_id
                next_id += 1
            else:
                word_map[w] = 0
    return word_map, next_id - 1
