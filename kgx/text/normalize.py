"""Text normalization & tokenization — the shared kernel (SURVEY §2 B3).

One definition, three consumers: the fixture generator, the detection UDF,
and the dictionary loader.  If these ever diverge, offsets or lookups break,
so everything funnels through this module.

Reference parity: the reference normalizes document text before NER
(``normalize_text`` option on its ChemSpot wrapper [PK: molminer/ChemSpot.py];
SURVEY §2 B3).  Our contract is stricter: normalization NEVER shifts offsets —
mention (start, end) always indexes raw ``content`` (SURVEY §7 hard-part 4).
We achieve that by normalizing per-token (the token carries its raw span),
never by rewriting the document.

Token model: a *chem token* is a maximal run of ``[A-Za-z0-9]`` optionally
chained with single ``,``/``-``/``'`` separators — so ``2,3-dimethylbutan-1-ol``
is ONE token while ``water_density`` splits into ``water`` + ``density``
(underscore and other punctuation are boundaries).  Multi-word dictionary
terms match as runs of consecutive tokens, normalized as the lowercase
token sequence joined by single spaces.
"""

from __future__ import annotations

import re

# maximal chemical-ish token: alnum runs chained by , - '
TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:[,\-'][A-Za-z0-9]+)*")

# non-token characters used when reducing a term to its token sequence
_SEP_RE = re.compile(r"[^A-Za-z0-9,\-']+")
_SQUEEZE_RE = re.compile(r"[^a-z0-9]+")

# the longest dictionary term, in tokens, we will try to match
MAX_TERM_TOKENS = 4


def tokenize_with_spans(text: str) -> list[tuple[int, int, str]]:
    """Raw text -> [(start, end, token)] with offsets into the raw text."""
    return [(m.start(), m.end(), m.group(0)) for m in TOKEN_RE.finditer(text)]


def norm_term(term: str) -> str:
    """Canonical lookup form of a dictionary term or a mention surface.

    Lowercase; token-internal ``,-'`` preserved; whitespace/punctuation
    between tokens collapsed to one space.  Idempotent.
    """
    parts = (p.strip(",-'") for p in _SEP_RE.split(term.lower()))
    return " ".join(p for p in parts if p)


def skeleton(term: str) -> str:
    """Separator-free form for OPSIN-style systematic resolution (SURVEY C4).

    ``2,3-dimethyl butan-1-ol`` and ``2,3-dimethylbutan-1-ol`` share one
    skeleton — the closed-world stand-in for parsing a systematic name to
    its structure.  Idempotent.
    """
    return _SQUEEZE_RE.sub("", term.lower())


def shingles(term: str, k: int = 3) -> set[str]:
    """Character k-shingles of the normalized term (minhash/fuzzy input)."""
    s = norm_term(term)
    if len(s) <= k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def levenshtein(a: str, b: str, cap: int = 64) -> int:
    """Plain DP edit distance (used only inside Arrow-batched rerank on
    small candidate sets — never row-at-a-time over the corpus)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if abs(len(a) - len(b)) >= cap:
        return cap
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# --- Spark column-expression versions (JVM-side, codegen'd) ---------------


def norm_term_col(col):
    """Column-expression twin of :func:`norm_term` for JVM-side use."""
    from pyspark.sql import functions as F

    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9,\-']+", " ")
    c = F.regexp_replace(c, r"(^|\s)[,\-']+|[,\-']+(\s|$)", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def skeleton_col(col):
    """Column-expression twin of :func:`skeleton`."""
    from pyspark.sql import functions as F

    return F.regexp_replace(F.lower(col), r"[^a-z0-9]+", "")
