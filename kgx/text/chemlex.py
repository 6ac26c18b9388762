"""Chemical-lexicon heuristics shared by the fixture generator and the
detection kernel (SURVEY §2 C1).

This is the closed-world stand-in for ChemSpot's CRF + dictionary NER
[PK: molminer/ChemSpot.py; BASELINE.json:L6 "ChemSpot-style chemical NER"].
The same predicates decide (a) which surface forms the generator may corrupt
into fuzzy variants and (b) which unknown tokens the detector proposes as
candidate mentions — keeping ground truth and detection in agreement by
construction.
"""

from __future__ import annotations

import re
from functools import lru_cache

# --- morpheme grammar (used to BUILD systematic names and to RECOGNIZE
# systematic-looking tokens) ------------------------------------------------

STEMS = ("meth", "eth", "prop", "but", "pent", "hex", "hept", "oct", "non", "dec")
SUBSTITUENTS = (
    "methyl",
    "ethyl",
    "propyl",
    "chloro",
    "bromo",
    "fluoro",
    "hydroxy",
    "amino",
    "nitro",
    "oxo",
)
MULTIPLIERS = ("", "di", "tri", "tetra")
# single-token suffixes; ("oic", "acid") yields two-token names
SUFFIXES = ("ane", "ene", "yne", "ol", "al", "one", "amine", "oic acid")

# fixed trivial-name list; water & ethanol first = the hot-skew compounds
# (BASELINE.json:L6 "hot compounds like 'water'/'ethanol'")
TRIVIAL_NAMES = (
    "water",
    "ethanol",
    "benzene",
    "aspirin",
    "caffeine",
    "glucose",
    "acetone",
    "ammonia",
    "methane",
    "toluene",
    "phenol",
    "morphine",
    "nicotine",
    "sucrose",
    "fructose",
    "cholesterol",
    "adrenaline",
    "dopamine",
    "serotonin",
    "insulin",
    "penicillin",
    "ibuprofen",
    "paracetamol",
    "codeine",
    "quinine",
    "menthol",
    "camphor",
    "vanillin",
    "citrate",
    "urea",
    "glycerol",
    "lactose",
    "maltose",
    "cellulose",
    "chitin",
    "keratin",
    "collagen",
    "hemoglobin",
    "chlorophyll",
    "melatonin",
)

# morphemes that mark a token as chemistry-flavoured (recognition side);
# includes stems of the trivial list so corrupted trivial names still fire
_MORPHEMES = STEMS + (
    "chlor",
    "brom",
    "fluor",
    "hydroxy",
    "amino",
    "nitro",
    "oxo",
    "benz",
    "tolu",
    "phen",
    "caff",
    "gluc",
    "acet",
    "ammon",
    "morph",
    "nicot",
    "sucr",
    "fruct",
    "cholest",
    "adrenal",
    "dopam",
    "seroton",
    "insul",
    "penicill",
    "ibuprof",
    "paracet",
    "codein",
    "quin",
    "menth",
    "camph",
    "vanill",
    "citr",
    "glycer",
    "lact",
    "malt",
    "cellul",
    "chit",
    "kerat",
    "collag",
    "hemoglob",
    "chloroph",
    "melaton",
)

# suffixes that license a fuzzy SYSTEMATIC candidate (selective on purpose:
# common English endings like -ate/-ide/-al excluded to protect precision
# against ordinary identifiers such as `update` / `total`)
_SUFFIX_RE = re.compile(r"(ane|ene|yne|anol|ol|one|amine|oic|acid|ine|ose)$")
_MORPHEME_RE = re.compile("|".join(_MORPHEMES))

# molecular formula: element symbols + counts, must contain a digit
FORMULA_RE = re.compile(r"^(?:[A-Z][a-z]?\d*){2,}$")
_DIGIT_RE = re.compile(r"\d")

# doc-local abbreviation token: 2-6 uppercase letters/digits, starts with letter
ABBREV_RE = re.compile(r"^[A-Z][A-Z0-9]{1,5}$")

# CAS registry number: 2-7 digits, 2 digits, 1 check digit (ChemSpot's
# IDENTIFIER type)
CAS_RE = re.compile(r"^\d{2,7}-\d{2}-\d$")


def is_cas_like(token_raw: str) -> bool:
    return CAS_RE.match(token_raw) is not None


def is_systematic_like(token_lower: str) -> bool:
    """True if an (unknown) lowercase token looks like a chemical name —
    the fuzzy-candidate gate. Shared by generator (which only corrupts
    names that stay recognizable) and detector.  lru-cached: corpus tokens
    repeat heavily, so in the detection hot loop this is a dict hit."""
    return _is_systematic_like(token_lower)


@lru_cache(maxsize=1 << 16)
def _is_systematic_like(token_lower: str) -> bool:
    return (
        len(token_lower) >= 6
        and _SUFFIX_RE.search(token_lower) is not None
        and _MORPHEME_RE.search(token_lower) is not None
    )


def is_formula_like(token_raw: str) -> bool:
    return (
        len(token_raw) >= 3
        and _DIGIT_RE.search(token_raw) is not None
        and FORMULA_RE.match(token_raw) is not None
    )


def is_abbrev_like(token_raw: str) -> bool:
    return ABBREV_RE.match(token_raw) is not None


# filler vocabulary for synthetic source code — kept disjoint from every
# dictionary unigram and from the fuzzy/formula/abbrev gates above
# (gen.py asserts this at generation time)
FILLER_WORDS = (
    "buffer",
    "index",
    "count",
    "offset",
    "status",
    "config",
    "handler",
    "result",
    "tmp",
    "node",
    "item",
    "queue",
    "stack",
    "cache",
    "parser",
    "input",
    "output",
    "update",
    "delete",
    "create",
    "process",
    "worker",
    "mapper",
    "reducer",
    "writer",
    "reader",
    "helper",
    "loader",
    "packet",
    "header",
    "footer",
    "cursor",
    "record",
    "branch",
    "merge",
    "commit",
    "stream",
    "window",
    "filter",
    "reduce",
    "collect",
)
