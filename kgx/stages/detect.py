"""Stage 1 — vectorized mention detection (SURVEY §2 C1, K1).

The ChemSpot analogue [PK: molminer/ChemSpot.py; BASELINE.json:L6 stage (1)
"vectorized mention detection emitting candidate chemical-entity spans per
file"], re-expressed as an Arrow-batched ``mapInArrow`` kernel:

* greedy leftmost-longest dictionary n-gram matching over chem-tokens
  (the dictionary membership index arrives as a SparkContext broadcast —
  one deserialization per executor, not per row),
* regex candidate channels for surfaces NOT in the lexicon: molecular
  formulas, systematic-looking tokens (morpheme + suffix gate — these feed
  the minhash/fuzzy linker), and doc-local abbreviations,
* abbreviation definition capture: ``long form (ABBR)`` binds ABBR to the
  long form's normalized text for this document only; every occurrence of a
  bound ABBR is emitted with ``defined_as`` set (MolMiner's doc-local
  abbreviation linking [BASELINE.json:L6]).

Offsets always index the raw ``content`` — normalization happens per-token
and never rewrites the document (SURVEY §7 hard-part 4).

Scale notes: per-row work is O(tokens); the only shuffle implied by this
stage is the explicit corpus repartition on file_key done upstream.  Content
is dropped from the output schema immediately (column pruning by
construction — SURVEY §2 B1).
"""

from __future__ import annotations

from itertools import accumulate, chain
from operator import add

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.text import chemlex as cl
from kgx.text.normalize import MAX_TERM_TOKENS, TOKEN_RE

# output schema of the kernel (mention_id attached afterwards, JVM-side)
DETECT_SCHEMA = (
    "file_key string, repo string, path string, commit string, lang string, "
    "start int, end int, text string, norm_text string, mtype string, "
    "defined_as string"
)

_WS = (" ", "\t")
_WS_SET = frozenset(_WS)

import re

# capturing twin of TOKEN_RE: one C-level split yields gaps AND tokens
# interleaved, so token offsets come from length prefix sums (itertools
# accumulate) instead of a per-match .span() call
_SPLIT_RE = re.compile("(" + TOKEN_RE.pattern + ")")

# cache of {id(index): (strong ref, first tokens of multi-token terms)} —
# one dictionary per worker process in practice, so the strong ref pins at
# most a handful of already-broadcast objects
_MULTI_FIRST_CACHE: dict[int, tuple[dict, frozenset]] = {}


def _multi_first(index: dict[str, str]) -> frozenset:
    """First tokens of multi-token lexicon terms: the n-gram (k>1) probe is
    worth attempting only at these positions.  Most corpus tokens are not
    in this set, so the greedy matcher does ONE dict lookup per token
    instead of MAX_TERM_TOKENS joins+lookups."""
    cached = _MULTI_FIRST_CACHE.get(id(index))
    if cached is not None and cached[0] is index:
        return cached[1]
    firsts = frozenset(k.split(" ", 1)[0] for k in index if " " in k)
    _MULTI_FIRST_CACHE[id(index)] = (index, firsts)
    return firsts


def _classify_fallback(raw: str, low: str):
    """Non-lexicon channels, in the kernel's dispatch order: abbrev/formula
    (uppercase start) -> CAS (digit start, must contain '-') -> systematic
    morpheme+suffix gate.  Position-independent — memoizable per raw token."""
    c0 = raw[0]
    if "A" <= c0 <= "Z":
        if cl.is_abbrev_like(raw):
            return ("A",)
        if cl.is_formula_like(raw):
            return ("F", low)
    elif "0" <= c0 <= "9":
        # CAS shape always contains '-': skip the regex for the pure
        # number literals that dominate digit-start tokens in code
        if "-" in raw and cl.is_cas_like(raw):
            return ("C", low)
    if len(low) >= 6 and cl._is_systematic_like(low):
        return ("S", low)
    return None


def _classify(raw: str, index: dict[str, str], multi_first: frozenset):
    """Token action, a pure function of the RAW token string:

    ``("M", low, mtype|None, fallback)`` — may start a multi-token lexicon
    term (probe positions i..i+k); ``("H", low, mtype)`` — single-token
    lexicon hit; ``("A",)`` abbrev candidate; ``("F", low)`` formula;
    ``("C", low)`` CAS; ``("S", low)`` systematic-like; ``None`` inert.
    """
    low = raw.lower()
    mtype = index.get(low)
    if low in multi_first:
        return ("M", low, mtype, _classify_fallback(raw, low))
    if mtype is not None:
        return ("H", low, mtype)
    return _classify_fallback(raw, low)


class _TokenMemo(dict):
    """Per-worker raw-token -> action cache.  Corpus tokens are Zipfian, so
    ``map(memo.__getitem__, raws)`` classifies a document at C speed with
    ``__missing__`` firing only on first sight of a token.  Bounded: a
    pathological all-unique-token corpus clears rather than grows."""

    __slots__ = ("index", "multi_first")
    _MAX = 200_000

    def __init__(self, index: dict[str, str], multi_first: frozenset):
        super().__init__()
        self.index = index
        self.multi_first = multi_first

    def __missing__(self, raw: str):
        v = _classify(raw, self.index, self.multi_first)
        if len(self) >= self._MAX:
            self.clear()
        self[raw] = v
        return v


class _FlagMemo(dict):
    """Per-worker raw-token -> interesting? (1/0) cache.  The scan for
    interesting positions runs entirely in C (``bytes(map(...))`` +
    ``bytes.find``); the full ACTION tuple is fetched from the companion
    :class:`_TokenMemo` only at the few-percent of positions that matter.
    Flags are a pure function of the token (same classify), so the two
    memos may clear independently without divergence."""

    __slots__ = ("amemo",)
    _MAX = 200_000

    def __init__(self, amemo: "_TokenMemo"):
        super().__init__()
        self.amemo = amemo

    def __missing__(self, raw: str):
        v = 1 if self.amemo[raw] is not None else 0
        if len(self) >= self._MAX:
            self.clear()
        self[raw] = v
        return v


_MEMO_CACHE: dict[int, tuple[dict, "_TokenMemo", "_FlagMemo"]] = {}


def _memo_for(index: dict[str, str]) -> tuple["_TokenMemo", "_FlagMemo"]:
    cached = _MEMO_CACHE.get(id(index))
    if cached is not None and cached[0] is index:
        return cached[1], cached[2]
    memo = _TokenMemo(index, _multi_first(index))
    fmemo = _FlagMemo(memo)
    _MEMO_CACHE[id(index)] = (index, memo, fmemo)
    return memo, fmemo


def detect_in_text(text: str, index: dict[str, str]) -> list[dict]:
    """Dict-row view of :func:`_detect_rows` (unit-test / oracle surface)."""
    return [
        {
            "start": s,
            "end": e,
            "text": t,
            "norm_text": nrm,
            "mtype": mt,
            "defined_as": df,
        }
        for (s, e, t, nrm, mt, df) in _detect_rows(text, index)
    ]


def _detect_rows(text: str, index: dict[str, str]) -> list[tuple]:
    """Pure-python kernel over one document; unit-testable without Spark.
    Returns ``(start, end, text, norm_text, mtype, defined_as)`` tuples.

    Hot-loop layout (round-5 rework + round-7 flag scan, byte-identical
    output pinned by the golden/property tests and the 50-query oracle):

    * ONE capturing-regex split per document (C) yields gaps and tokens
      interleaved; token offsets are C-level length prefix sums — no match
      objects, no per-token ``.span()``/slicing;
    * every raw token resolves to a memoized 0/1 FLAG via ``bytes(map(
      dict.__getitem__, raws))`` and interesting positions come from
      C-level ``bytes.find`` — classification (lexicon membership, abbrev/
      formula/CAS shape, systematic gate) runs once per DISTINCT token per
      worker, and the per-occurrence cost of an inert token is one C dict
      lookup, with no Python-level scan and no action-list allocation;
    * the stateful positional loop (greedy multi-token lexicon match,
      "acid" continuation, abbrev context) visits only the interesting
      positions — a few percent of tokens on a code corpus — fetching the
      full action tuple from the companion memo only there.

    Tokens from TOKEN_RE can't start/end with ``,-'`` nor contain separator
    runs, so ``norm_term(tok) == tok.lower()`` — property-tested in
    tests/test_normalize.py.
    """
    parts = _SPLIT_RE.split(text)
    raws = parts[1::2]
    n = len(raws)
    if not n:
        return []
    memo, fmemo = _memo_for(index)
    flags = bytes(map(fmemo.__getitem__, raws))
    work = []
    _find = flags.find
    pos = _find(1)
    while pos != -1:
        work.append(pos)
        pos = _find(1, pos + 1)
    if not work:
        return []

    # token offsets from the split pieces, all C: text is the alternating
    # concatenation gap0 + tok0 + gap1 + ... + gapN, so
    # starts[i] = starts[i-1] + len(tok[i-1]) + len(gap[i])
    gl = list(map(len, parts[::2]))
    rl = list(map(len, raws))
    starts = list(accumulate(chain((gl[0],), map(add, rl[:-1], gl[1:-1]))))
    ends = list(map(add, starts, rl))

    def gap_ws(j: int) -> bool:
        # tokens j and j+1 separated by ≥1 space/tab only (adjacent maximal
        # matches always have a ≥1-char gap, but keep the non-empty check
        # exact); the gap string is already split out — no slicing
        g = parts[2 * j + 2]
        return g != "" and not g.strip(" \t")

    out: list[tuple] = []
    dict_spans: list[tuple[int, int, str]] = []  # (start, end, norm) of lexicon hits
    abbrev_toks: list[int] = []
    index_get = index.get

    consumed = 0  # first token index not yet consumed by an emission
    for i in work:
        if i < consumed:
            continue
        a = memo[raws[i]]
        tag = a[0]
        if tag == "M":
            # greedy leftmost-longest lexicon match; k>1 only where a
            # multi-token term can possibly start
            low = a[1]
            matched = False
            for k in range(min(MAX_TERM_TOKENS, n - i), 0, -1):
                if k > 1:
                    # n-gram tokens must be separated by spaces/tabs only
                    if not all(gap_ws(j) for j in range(i, i + k - 1)):
                        continue
                    cand = " ".join(map(str.lower, raws[i : i + k]))
                    mtype = index_get(cand)
                else:
                    cand = low
                    mtype = a[2]
                if mtype is not None:
                    s, e = starts[i], ends[i + k - 1]
                    out.append((s, e, text[s:e], cand, mtype, None))
                    dict_spans.append((s, e, cand))
                    consumed = i + k
                    matched = True
                    break
            if matched:
                continue
            a = a[3]  # probe missed: fall through to the non-lexicon channels
            if a is None:
                continue
            tag = a[0]
        if tag == "H":
            s, e = starts[i], ends[i]
            out.append((s, e, raws[i], a[1], a[2], None))
            dict_spans.append((s, e, a[1]))
            consumed = i + 1
        elif tag == "A":
            # candidate abbreviation; resolved in pass 2 (doc-local defs),
            # with a fuzzy-systematic fallback in pass 3
            abbrev_toks.append(i)
            consumed = i + 1
        elif tag == "F":
            out.append((starts[i], ends[i], raws[i], a[1], "FORMULA", None))
            consumed = i + 1
        elif tag == "C":
            # CAS registry number (ChemSpot IDENTIFIER); linked exactly
            # via the lexicon index when known, else an unlinked span
            out.append((starts[i], ends[i], raws[i], a[1], "IDENTIFIER", None))
            consumed = i + 1
        else:  # "S"
            # "-oic acid" continuation: a systematic-looking token followed
            # by space-adjacent "acid" is one two-token mention
            s = starts[i]
            low = a[1]
            if i + 1 < n and raws[i + 1].lower() == "acid" and gap_ws(i):
                e = ends[i + 1]
                nrm = f"{low} acid"
                consumed = i + 2
            else:
                e = ends[i]
                nrm = low
                consumed = i + 1
            out.append((s, e, text[s:e], nrm, "SYSTEMATIC", None))

    # pass 2: abbreviation definitions — "<lexicon mention> (ABBR)"
    end_to_norm = {e: nrm for (_s, e, nrm) in dict_spans}
    defs: dict[str, str] = {}
    for ti in abbrev_toks:
        s, e = starts[ti], ends[ti]
        raw = raws[ti]
        if (
            s >= 2
            and e < len(text)
            and text[s - 1] == "("
            and text[e] == ")"
            and text[s - 2] in _WS
        ):
            long_norm = end_to_norm.get(s - 2)
            if long_norm is not None:
                defs[raw] = long_norm

    # pass 3: emit bound abbreviations; unbound uppercase tokens fall back to
    # the fuzzy-systematic channel (e.g. a corrupted name in an ALL_CAPS
    # identifier) — ordinary code constants pass neither gate
    for ti in abbrev_toks:
        s, e = starts[ti], ends[ti]
        raw = raws[ti]
        long_norm = defs.get(raw)
        if long_norm is not None:
            out.append((s, e, raw, raw.lower(), "ABBREVIATION", long_norm))
        elif cl.is_systematic_like(raw.lower()):
            out.append((s, e, raw, raw.lower(), "SYSTEMATIC", None))

    out.sort(key=lambda m: (m[0], m[1]))
    return out


def detect_mentions(files: DataFrame, index_bc) -> DataFrame:
    """files (keyed corpus incl. ``content``) -> MENTIONS DataFrame.

    ``index_bc`` is a ``sparkContext.broadcast({norm_term: mtype})`` — the
    detection membership index built by kgx.io.dictionary.detection_index.
    """

    meta_cols = ["file_key", "repo", "path", "commit", "lang"]

    def kernel(batches):
        # mapInArrow, not mapInPandas (round-7 rework, guide §4.2): only
        # ``content`` is materialized as Python strings (the kernel needs
        # them for the C regex); the 5 meta columns replicate per mention
        # via Arrow ``take`` on the original batch — no pandas frame on
        # either side and no Python-object round trip for ~5 meta strings
        # × corpus rows.  Mention rows are tuples transposed to Arrow
        # arrays with one C-level zip.
        import numpy as np
        import pyarrow as pa

        index = index_bc.value  # one lookup per python worker process
        out_fields = [
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("text", pa.string()),
            ("norm_text", pa.string()),
            ("mtype", pa.string()),
            ("defined_as", pa.string()),
        ]
        for batch in batches:
            contents = batch.column(batch.schema.get_field_index("content")).to_pylist()
            per_doc = [_detect_rows(c or "", index) for c in contents]
            counts = np.fromiter(map(len, per_doc), np.int64, count=len(per_doc))
            flat = [m for ms in per_doc for m in ms]
            idx = pa.array(np.repeat(np.arange(len(per_doc)), counts), pa.int64())
            meta = batch.select(meta_cols).take(idx)
            cols = zip(*flat) if flat else ((),) * len(out_fields)
            arrays = list(meta.columns) + [
                pa.array(vals, typ) for vals, (_n, typ) in zip(cols, out_fields)
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=meta_cols + [n for n, _t in out_fields]
            )

    mentions = files.select(*meta_cols, "content").mapInArrow(kernel, DETECT_SCHEMA)
    # deterministic mention identity: hash of (file_key, span) — JVM-side
    return mentions.withColumn(
        "mention_id", F.xxhash64("file_key", "start", "end")
    ).select(
        "file_key",
        "repo",
        "path",
        "commit",
        "lang",
        "mention_id",
        "start",
        "end",
        "text",
        "norm_text",
        "mtype",
        "defined_as",
    )
