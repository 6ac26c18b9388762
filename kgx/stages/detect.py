"""Stage 1 — vectorized mention detection (SURVEY §2 C1, K1).

The ChemSpot analogue [PK: molminer/ChemSpot.py; BASELINE.json:L6 stage (1)
"vectorized mention detection emitting candidate chemical-entity spans per
file"], re-expressed as an Arrow-batched ``mapInPandas`` kernel:

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

from collections.abc import Iterator

import pandas as pd
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


def detect_in_text(text: str, index: dict[str, str]) -> list[dict]:
    """Pure-python kernel over one document; unit-testable without Spark.

    Hot-loop layout (round-3 rework, byte-identical output pinned by the
    golden/property tests): tokenization keeps only ``span()`` per match and
    slices tokens out of one whole-document ``lower()`` — no per-token
    ``.group()/.start()/.end()/.lower()`` method calls; inter-token
    whitespace gates are checked lazily at the handful of positions where a
    multi-token probe or an "acid" continuation actually needs them (most
    tokens need no gap information at all); the common single-token path
    does one dict lookup with no inner loop.
    """
    spans = [m.span() for m in TOKEN_RE.finditer(text)]
    n = len(spans)
    low_text = text.lower()
    # tokens from TOKEN_RE can't start/end with ,-' nor contain separator
    # runs, so norm_term(tok) == tok.lower() — property-tested in
    # tests/test_normalize.py; skips a regex split per token
    norms = [low_text[s:e] for s, e in spans]
    multi_first = _multi_first(index)

    def gap_ws(j: int) -> bool:
        # tokens j and j+1 separated by ≥1 space/tab only (adjacent maximal
        # matches always have a ≥1-char gap, but keep the < check exact)
        e = spans[j][1]
        s2 = spans[j + 1][0]
        return e < s2 and not text[e:s2].strip(" \t")

    out: list[dict] = []
    dict_spans: list[tuple[int, int, str]] = []  # (start, end, norm) of lexicon hits
    abbrev_toks: list[int] = []
    index_get = index.get
    is_systematic_like = cl._is_systematic_like  # lru core, skip the wrapper

    i = 0
    while i < n:
        cand = norms[i]
        # greedy leftmost-longest lexicon match; k>1 only where a
        # multi-token term can possibly start
        if cand in multi_first:
            matched = False
            for k in range(min(MAX_TERM_TOKENS, n - i), 0, -1):
                if k > 1:
                    # n-gram tokens must be separated by spaces/tabs only
                    if not all(gap_ws(j) for j in range(i, i + k - 1)):
                        continue
                    cand = " ".join(norms[i : i + k])
                else:
                    cand = norms[i]
                mtype = index_get(cand)
                if mtype is not None:
                    s, e = spans[i][0], spans[i + k - 1][1]
                    out.append(
                        {
                            "start": s,
                            "end": e,
                            "text": text[s:e],
                            "norm_text": cand,
                            "mtype": mtype,
                            "defined_as": None,
                        }
                    )
                    dict_spans.append((s, e, cand))
                    i += k
                    matched = True
                    break
            if matched:
                continue
        else:
            mtype = index_get(cand)
            if mtype is not None:
                s, e = spans[i]
                out.append(
                    {
                        "start": s,
                        "end": e,
                        "text": text[s:e],
                        "norm_text": cand,
                        "mtype": mtype,
                        "defined_as": None,
                    }
                )
                dict_spans.append((s, e, cand))
                i += 1
                continue

        s, e = spans[i]
        low = norms[i]
        # first-char dispatch: abbrev/formula need an uppercase start, CAS a
        # digit — most tokens are lowercase and skip straight to the
        # systematic gate without touching those regexes
        c0 = text[s]
        if "A" <= c0 <= "Z":
            raw = text[s:e]
            if cl.is_abbrev_like(raw):
                # candidate abbreviation; resolved in pass 2 (doc-local
                # defs), with a fuzzy-systematic fallback in pass 3
                abbrev_toks.append(i)
                i += 1
                continue
            if cl.is_formula_like(raw):
                out.append(
                    {
                        "start": s,
                        "end": e,
                        "text": raw,
                        "norm_text": low,
                        "mtype": "FORMULA",
                        "defined_as": None,
                    }
                )
                i += 1
                continue
        elif "0" <= c0 <= "9":
            raw = text[s:e]
            # CAS shape always contains '-': skip the regex for the pure
            # number literals that dominate digit-start tokens in code
            if "-" in raw and cl.is_cas_like(raw):
                # CAS registry number (ChemSpot IDENTIFIER); linked exactly
                # via the lexicon index when known, else an unlinked span
                out.append(
                    {
                        "start": s,
                        "end": e,
                        "text": raw,
                        "norm_text": low,
                        "mtype": "IDENTIFIER",
                        "defined_as": None,
                    }
                )
                i += 1
                continue
        if len(low) >= 6 and is_systematic_like(low):
            # "-oic acid" continuation: a systematic-looking token followed
            # by space-adjacent "acid" is one two-token mention
            if i + 1 < n and norms[i + 1] == "acid" and gap_ws(i):
                e = spans[i + 1][1]
                nrm = f"{low} acid"
                i += 2
            else:
                nrm = low
                i += 1
            out.append(
                {
                    "start": s,
                    "end": e,
                    "text": text[s:e],
                    "norm_text": nrm,
                    "mtype": "SYSTEMATIC",
                    "defined_as": None,
                }
            )
            continue
        i += 1

    # pass 2: abbreviation definitions — "<lexicon mention> (ABBR)"
    end_to_norm = {e: nrm for (_s, e, nrm) in dict_spans}
    defs: dict[str, str] = {}
    for ti in abbrev_toks:
        s, e = spans[ti]
        raw = text[s:e]
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
        s, e = spans[ti]
        raw = text[s:e]
        long_norm = defs.get(raw)
        if long_norm is not None:
            out.append(
                {
                    "start": s,
                    "end": e,
                    "text": raw,
                    "norm_text": raw.lower(),
                    "mtype": "ABBREVIATION",
                    "defined_as": long_norm,
                }
            )
        elif cl.is_systematic_like(raw.lower()):
            out.append(
                {
                    "start": s,
                    "end": e,
                    "text": raw,
                    "norm_text": raw.lower(),
                    "mtype": "SYSTEMATIC",
                    "defined_as": None,
                }
            )

    out.sort(key=lambda m: (m["start"], m["end"]))
    return out


def detect_mentions(files: DataFrame, index_bc) -> DataFrame:
    """files (keyed corpus incl. ``content``) -> MENTIONS DataFrame.

    ``index_bc`` is a ``sparkContext.broadcast({norm_term: mtype})`` — the
    detection membership index built by kgx.io.dictionary.detection_index.
    """

    meta_cols = ["file_key", "repo", "path", "commit", "lang"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index = index_bc.value  # one lookup per python worker process
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                for m in detect_in_text(r.content or "", index):
                    m2 = {c: getattr(r, c) for c in meta_cols}
                    m2.update(m)
                    rows.append(m2)
            cols = meta_cols + ["start", "end", "text", "norm_text", "mtype", "defined_as"]
            yield pd.DataFrame(rows, columns=cols)

    mentions = files.select(*meta_cols, "content").mapInPandas(kernel, DETECT_SCHEMA)
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
