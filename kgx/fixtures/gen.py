"""Deterministic fixture generator (FIXTURES.md §A; seed=42, no wall clock).

Synthesizes the closed-world ground truth the pipeline is graded against:

* ``compound_dict``   — the lexicon (canonical + synonym + formula surfaces,
  SMILES/InChI/InChIKey; ~12% duplicate entries sharing an InChIKey to drive
  synonymOf / connected-components merging),
* ``source_files``    — a corpus shaped exactly ``(repo, path, commit, lang,
  content)`` [BASELINE.json:L15] with compound mentions injected at recorded
  offsets (comments, string literals, identifiers), Zipf compound skew with
  water/ethanol hot in ~30% of files [BASELINE.json:L6],
* ``golden_mentions`` — the injected spans (ground truth by construction;
  ``compound_id`` null marks deliberate hard-negative traps),
* ``golden_triples``  — derived by the pandas paper oracle (fixtures/oracle.py),
* ``manifest``        — (repo, path, commit, content_sha) for the per-row
  sha256 invariant [BASELINE.json:L15].

Everything is pure python + pyarrow (no Spark) so generation is fast and the
ground truth is independent of the system under test.
"""

from __future__ import annotations

import hashlib
import json
import random
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgx.fixtures.oracle import derive_golden_links, derive_golden_triples
from kgx.text import chemlex as cl
from kgx.text.normalize import norm_term

SEED = 42

# scale -> (n_files, n_base_structures)
SCALES = {
    "tiny": (200, 300),
    "small": (5000, 3000),
    "bench": (60000, 8000),
    # scaling: sized so parallel compute dominates the per-job serial floor
    # (~30 s of broadcast/UDF-stage setup) — the regime where the N→4N
    # efficiency criterion is meaningful
    "scaling": (2400000, 8000),
    # scaling2: 2× scaling — after the round-2 detect-kernel speedup (5.5×)
    # the 2.4M corpus left the gate pair floor-dominated again; this keeps
    # the perfectly-parallel fraction dominant per the same design rule
    "scaling2": (4800000, 8000),
}

LANGS = ("python", "java", "c", "go", "rust", "markdown")
LANG_W = (35, 20, 15, 10, 10, 10)
LANG_EXT = {
    "python": ".py",
    "java": ".java",
    "c": ".c",
    "go": ".go",
    "rust": ".rs",
    "markdown": ".md",
}
LANG_CMT = {
    "python": "#",
    "java": "//",
    "c": "//",
    "go": "//",
    "rust": "//",
    "markdown": ">",
}

_B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def _inchikey(inchi: str) -> str:
    h = hashlib.sha256(inchi.encode()).digest()
    chars = [_B32[b % 32] for b in h[:25]]
    return "".join(chars[:14]) + "-" + "".join(chars[14:24]) + "-" + chars[24]


def _smiles(sid: int) -> str:
    atoms = "CONS"
    out = ["C"]
    x = sid + 7
    while x:
        out.append(atoms[x % 4])
        x //= 5
    out.append("(=O)" if sid % 3 == 0 else "O")
    return "".join(out)


def _formula(sid: int, used: set[str]) -> str:
    c, h = 1 + sid % 19, 2 + (sid * 7) % 40
    o, n = sid % 7, (sid * 3) % 5
    f = f"C{c}H{h}" + (f"N{n}" if n else "") + (f"O{o}" if o else "")
    while f in used:
        h += 40
        f = f"C{c}H{h}" + (f"N{n}" if n else "") + (f"O{o}" if o else "")
    used.add(f)
    return f


def _systematic_name(rng: random.Random, used_norms: set[str]) -> str:
    """Build a unique IUPAC-morpheme-grammar name, e.g. 2,3-dimethylbutan-1-ol."""
    for _ in range(64):
        stem = rng.choice(cl.STEMS)
        suffix = rng.choice(cl.SUFFIXES)
        nsub = rng.choice((0, 1, 1, 2))
        subs = []
        for _ in range(nsub):
            mult = rng.choice(cl.MULTIPLIERS)
            nloc = {"": 1, "di": 2, "tri": 3, "tetra": 4}[mult]
            locs = ",".join(str(x) for x in sorted(rng.sample(range(1, 7), nloc)))
            subs.append(f"{locs}-{mult}{rng.choice(cl.SUBSTITUENTS)}")
        if suffix == "oic acid":
            tail = f"{stem}anoic acid"
        elif suffix in ("ane", "ene", "yne"):
            tail = f"{stem}{suffix}"
        else:
            tail = f"{stem}an-{rng.randint(1, 4)}-{suffix}"
        name = "".join(subs) + tail
        if norm_term(name) not in used_norms:
            used_norms.add(norm_term(name))
            return name
    raise RuntimeError("could not build a unique systematic name")


def _abbrev_of(name: str, rng: random.Random, used: set[str]) -> str:
    letters = [c for c in name.upper() if c.isalpha()]
    for _ in range(32):
        k = rng.randint(3, 5)
        cand = "".join(rng.choice(letters) for _ in range(k))
        cand = cand[0] + cand[1:]
        if cand not in used and cl.is_abbrev_like(cand):
            used.add(cand)
            return cand
    raise RuntimeError("could not build a unique abbreviation")


def _corrupt(name: str, rng: random.Random, term_norms: set[str]) -> str | None:
    """Edit-distance-1 corruption of the FIRST token that stays recognizably
    chemical (same gate the detector uses) and is NOT in the lexicon."""
    tok = name.split(" ")[0]
    if len(tok) < 7:
        return None
    # only corrupt alphabetic positions away from the edges, so the token
    # stays one chem-token (never creates ",," or leading/trailing seps)
    positions = [i for i in range(1, len(tok) - 3) if tok[i].isalpha() and tok[i - 1].isalpha()]
    if not positions:
        return None
    for _ in range(16):
        i = rng.choice(positions)
        if rng.random() < 0.5:
            cand_tok = tok[:i] + tok[i + 1 :]  # deletion
        else:
            cand_tok = tok[:i] + tok[i] + tok[i:]  # duplication
        cand = cand_tok + name[len(tok) :]
        if norm_term(cand) in term_norms:
            continue
        if cl.is_systematic_like(cand_tok.lower().split("-")[-1]) or cl.is_systematic_like(
            cand_tok.lower()
        ):
            return cand
    return None


def _dehyphenate(name: str, rng: random.Random, term_norms: set[str]) -> str | None:
    """Drop one hyphen from the first token — a surface variant whose
    *skeleton* still matches the lexicon (links via the OPSIN-style
    systematic resolver, SURVEY §2 C4) but whose normalized form does not."""
    tok = name.split(" ")[0]
    hyphens = [i for i, ch in enumerate(tok) if ch == "-"]
    if not hyphens:
        return None
    rng.shuffle(hyphens)
    for i in hyphens:
        cand_tok = tok[:i] + tok[i + 1 :]
        cand = cand_tok + name[len(tok) :]
        if norm_term(cand) not in term_norms and cl.is_systematic_like(cand_tok.lower()):
            return cand
    return None


def build_dictionary(n_structures: int, rng: random.Random):
    """-> (rows, term_norms) where rows follow schemas.COMPOUND_DICT order."""
    used_norms: set[str] = set()
    used_formulas: set[str] = set()
    used_abbrevs: set[str] = set()
    rows = []
    cid = 0

    used_cas: set[str] = set()

    def _cas(sid: int) -> str | None:
        if sid % 5 >= 3:  # ~40% of structures carry no CAS number
            return None
        c = f"{50 + (sid * 7) % 99950}-{10 + sid % 90}-{sid % 10}"
        while c in used_cas:
            sid += 99991
            c = f"{50 + (sid * 7) % 99950}-{10 + sid % 90}-{sid % 10}"
        used_cas.add(c)
        return c

    def add_entry(name, name_type, sid, synonyms, abbrev):
        nonlocal cid
        priority = 0 if name_type == "SYSTEMATIC" else 1
        inchi = f"InChI=1S/SYN{sid}/c{1 + sid % 97}-{1 + sid % 13}h"
        rows.append(
            {
                "compound_id": cid,
                "canonical_name": name,
                "name_type": name_type,
                "synonyms": synonyms,
                "formula": _formula(sid, used_formulas),
                "cas": _cas(sid) if name_type != "TRIVIAL" or sid % 2 == 0 else None,
                "smiles": _smiles(sid),
                "inchi": inchi,
                "inchikey": _inchikey(inchi),
                "abbrev": abbrev,
                "priority": priority,
            }
        )
        cid += 1

    for sid in range(n_structures):
        if sid < len(cl.TRIVIAL_NAMES):
            name, name_type = cl.TRIVIAL_NAMES[sid], "TRIVIAL"
            used_norms.add(norm_term(name))
        else:
            name, name_type = _systematic_name(rng, used_norms), "SYSTEMATIC"

        synonyms = []
        # hyphen->space surface variant (distinct normalized form); capped at
        # the detector's MAX_TERM_TOKENS n-gram window
        if "-" in name and rng.random() < 0.5:
            v = name.replace("-", " ")
            if len(norm_term(v).split()) <= 4 and norm_term(v) not in used_norms:
                used_norms.add(norm_term(v))
                synonyms.append(v)
        # in-lexicon misspelling (links via method=synonym)
        if rng.random() < 0.25:
            v = _corrupt(name, rng, used_norms)
            if v is not None:
                used_norms.add(norm_term(v))
                synonyms.append(v)

        abbrev = None
        if rng.random() < 0.15 and len(name) >= 5:
            abbrev = _abbrev_of(name, rng, used_abbrevs)

        add_entry(name, name_type, sid, synonyms, abbrev)

        # ~12% of structures get a duplicate lexicon entry (same structure,
        # different canonical name) -> synonymOf / CC-merge ground truth
        if rng.random() < 0.12:
            alias = None
            for _ in range(16):
                cand = f"{rng.choice(cl.SUBSTITUENTS)}{rng.choice(cl.STEMS)}ine"
                if norm_term(cand) not in used_norms:
                    alias = cand
                    break
            if alias is not None:
                used_norms.add(norm_term(alias))
                add_entry(alias, "TRIVIAL", sid, [], None)

    # every formula / CAS surface is also a lookup key
    term_norms = set(used_norms)
    for r in rows:
        term_norms.add(norm_term(r["formula"]))
        if r.get("cas"):
            term_norms.add(norm_term(r["cas"]))
    return rows, term_norms


class _FileBuilder:
    """Accumulates content segments while recording absolute mention spans."""

    def __init__(self):
        self.parts: list[str] = []
        self.pos = 0
        self.mentions: list[dict] = []  # start,end,text,mtype,compound_id

    def emit(self, s: str):
        self.parts.append(s)
        self.pos += len(s)

    def emit_line_with(self, prefix: str, spans: list[tuple[str, str, object]], suffix: str):
        """spans: [(surface, mtype, compound_id_or_None)] joined by ' '."""
        self.emit(prefix)
        for i, (surface, mtype, cid) in enumerate(spans):
            if i:
                self.emit(" ")
            if mtype is not None:
                self.mentions.append(
                    {
                        "start": self.pos,
                        "end": self.pos + len(surface),
                        "text": surface,
                        "mtype": mtype,
                        "compound_id": cid,
                    }
                )
            self.emit(surface)
        self.emit(suffix + "\n")

    def content(self) -> str:
        return "".join(self.parts)


def _filler_line(rng: random.Random, lang: str) -> str:
    w = lambda: rng.choice(cl.FILLER_WORDS)  # noqa: E731
    k = rng.randint(0, 997)
    cmt = LANG_CMT[lang]
    kind = rng.randint(0, 4)
    if kind == 0:
        return f"{cmt} {w()} {w()} {w()}\n"
    if kind == 1:
        return f"{w()}_{w()} = {k}\n"
    if kind == 2:
        return f"def {w()}_{w()}(x): return x + {k}\n" if lang == "python" else f"int {w()}_{w()} = {k};\n"
    if kind == 3:
        return f'{w()} = "{w()} {w()}"\n'
    return f"for {w()} in {w()}: {w()}({k})\n" if lang == "python" else f"while ({w()} < {k}) {w()}++;\n"


def _zipf_cdf(n: int, a: float) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), a)
    return np.cumsum(p / p.sum())


def build_corpus(dict_rows: list[dict], term_norms: set[str], n_files: int, rng: random.Random):
    by_id = {r["compound_id"]: r for r in dict_rows}
    n_cpd = len(dict_rows)
    cpd_cdf = _zipf_cdf(n_cpd, 1.1)

    n_repos = max(3, n_files // 100)
    repo_cdf = _zipf_cdf(n_repos, 1.3)
    repo_names = [f"org{i // 40}/repo{i % 40 if i // 40 else i}" for i in range(n_repos)]

    # guard: filler vocabulary must not collide with the lexicon or the
    # detector's candidate gates (keeps golden precision meaningful)
    for wrd in cl.FILLER_WORDS:
        assert norm_term(wrd) not in term_norms, wrd
        assert not cl.is_systematic_like(wrd), wrd
        assert not cl.is_formula_like(wrd), wrd

    files, goldens, manifest = [], [], []

    for fi in range(n_files):
        frng = random.Random(f"{SEED}/{fi}")
        repo = repo_names[int(np.searchsorted(repo_cdf, frng.random()))]
        lang = frng.choices(LANGS, weights=LANG_W, k=1)[0]
        module = frng.choice(cl.FILLER_WORDS)
        path = f"src/{module}/{frng.choice(cl.FILLER_WORDS)}_{fi}{LANG_EXT[lang]}"
        cmt = LANG_CMT[lang]

        # mention plan
        n_m = frng.choices((0, 1, 2, 3, 4, 5, 6), weights=(8, 18, 24, 22, 14, 9, 5), k=1)[0]
        plan_ids = [int(np.searchsorted(cpd_cdf, frng.random())) for _ in range(n_m)]
        if frng.random() < 0.30:  # hot-compound injection (water / ethanol)
            plan_ids.append(frng.choice((0, 1)))

        # versions: ~10% of files carry 2-3 commits; golden = lexicographic
        # max commit (the pipeline's latest-version dedup rule, SURVEY D7)
        n_ver = frng.choices((1, 2, 3), weights=(90, 7, 3), k=1)[0]
        commits = [hashlib.sha256(f"{repo}/{path}/v{v}".encode()).hexdigest()[:40] for v in range(n_ver)]
        latest = max(range(n_ver), key=lambda v: commits[v])

        for v in range(n_ver):
            vrng = random.Random(f"{SEED}/{fi}/{v}")
            ids = plan_ids if v == latest else plan_ids[: max(0, len(plan_ids) - 1)]
            fb = _FileBuilder()
            fb.emit(f"{cmt} module {module} rev {v}\n")

            for cid_idx, cid in enumerate(ids):
                for _ in range(vrng.randint(1, 3)):
                    fb.emit(_filler_line(vrng, lang))
                entry = by_id[cid]
                name = entry["canonical_name"]
                choice = vrng.random()
                surface, mtype = name, entry["name_type"]
                if choice < 0.13 and entry["synonyms"]:
                    surface = vrng.choice(entry["synonyms"])
                elif choice < 0.22:
                    fz = _corrupt(name, vrng, term_norms)
                    if fz is not None:
                        surface, mtype = fz, "SYSTEMATIC"
                elif choice < 0.28:
                    dv = _dehyphenate(name, vrng, term_norms)
                    if dv is not None:
                        surface, mtype = dv, "SYSTEMATIC"
                elif choice < 0.31:
                    surface, mtype = entry["formula"], "FORMULA"
                elif choice < 0.34 and entry.get("cas"):
                    surface, mtype = entry["cas"], "IDENTIFIER"
                elif choice < 0.42 and entry["abbrev"]:
                    # definition line + 1-2 bare usages
                    fb.emit_line_with(
                        f"{cmt} reagent ",
                        [(name, entry["name_type"], cid), (f"({entry['abbrev']})", None, None)],
                        " is measured",
                    )
                    # record the ABBR token inside the parens we just wrote:
                    # recompute its span from the last segment layout
                    abbr = entry["abbrev"]
                    line = f"{cmt} reagent {name} ({abbr}) is measured\n"
                    abbr_start = fb.pos - len(line) + line.index("(") + 1
                    fb.mentions.append(
                        {
                            "start": abbr_start,
                            "end": abbr_start + len(abbr),
                            "text": abbr,
                            "mtype": "ABBREVIATION",
                            "compound_id": cid,
                        }
                    )
                    for _ in range(vrng.randint(1, 2)):
                        fb.emit(_filler_line(vrng, lang))
                        fb.emit_line_with(
                            f"{cmt} add 5 ml of ",
                            [(abbr, "ABBREVIATION", cid)],
                            " to the mix",
                        )
                    continue

                ctx = vrng.randint(0, 2)
                single_token = surface.isalnum()
                if ctx == 2 and single_token:
                    if vrng.random() < 0.4:
                        up = surface.upper()
                        fb.emit_line_with("", [(up, mtype, cid)], f"_K = {vrng.randint(1, 99)}")
                    else:
                        fb.emit_line_with("", [(surface, mtype, cid)], f"_level = {vrng.randint(1, 99)}")
                elif ctx == 1:
                    fb.emit_line_with('msg = "reaction with ', [(surface, mtype, cid)], ' complete"')
                else:
                    fb.emit_line_with(f"{cmt} the ", [(surface, mtype, cid)], " sample is prepared")

            # hard negatives, ~4% of files (FIXTURES §A3): hot-name lookalike
            # identifier — the detector is EXPECTED to fire on the embedded
            # token (recorded with compound_id=null; costs triple-precision
            # only if the doc never truly mentions the compound)
            if vrng.random() < 0.04:
                hot_entry = by_id[vrng.choice((0, 1))]
                hot = hot_entry["canonical_name"]
                sfx = vrng.choice(("mark", "fall", "proof", "tight"))
                start = fb.pos  # surface begins the line
                fb.emit_line_with("", [(hot, None, None)], f"_{sfx} = {vrng.randint(1, 9)}")
                fb.mentions.append(
                    {
                        "start": start,
                        "end": start + len(hot),
                        "text": hot,
                        "mtype": hot_entry["name_type"],
                        "compound_id": None,
                    }
                )

            for _ in range(vrng.randint(1, 4)):
                fb.emit(_filler_line(vrng, lang))

            content = fb.content()
            sha = hashlib.sha256(content.encode()).hexdigest()
            files.append(
                {"repo": repo, "path": path, "commit": commits[v], "lang": lang, "content": content}
            )
            manifest.append({"repo": repo, "path": path, "commit": commits[v], "content_sha": sha})
            if v == latest:
                for m in fb.mentions:
                    goldens.append(
                        {
                            "repo": repo,
                            "path": path,
                            "commit": commits[v],
                            "start": m["start"],
                            "end": m["end"],
                            "text": m["text"],
                            "mtype": m["mtype"],
                            "compound_id": m["compound_id"],
                        }
                    )

    return files, goldens, manifest


def generate(scale: str, out_dir: str | Path) -> dict:
    n_files, n_structures = SCALES[scale]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(SEED)

    dict_rows, term_norms = build_dictionary(n_structures, rng)
    files, goldens, manifest = build_corpus(dict_rows, term_norms, n_files, rng)

    dict_pdf = pd.DataFrame(dict_rows)
    golden_pdf = pd.DataFrame(goldens)
    golden_pdf["compound_id"] = golden_pdf["compound_id"].astype("Int64")
    triples_pdf = derive_golden_triples(golden_pdf, dict_pdf)
    links_pdf = derive_golden_links(golden_pdf, dict_pdf)

    def write(name: str, pdf: pd.DataFrame, schema: pa.schema | None = None):
        tbl = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
        # small row groups so Spark's scan can split a single fixture file
        # across tasks (one giant row group = a one-task scan bottleneck)
        pq.write_table(tbl, out / f"{name}.parquet", row_group_size=16384)
        return len(pdf)

    counts = {
        "source_files": write("source_files", pd.DataFrame(files)),
        "compound_dict": write(
            "compound_dict",
            dict_pdf,
            pa.schema(
                [
                    ("compound_id", pa.int64()),
                    ("canonical_name", pa.string()),
                    ("name_type", pa.string()),
                    ("synonyms", pa.list_(pa.string())),
                    ("formula", pa.string()),
                    ("cas", pa.string()),
                    ("smiles", pa.string()),
                    ("inchi", pa.string()),
                    ("inchikey", pa.string()),
                    ("abbrev", pa.string()),
                    ("priority", pa.int32()),
                ]
            ),
        ),
        "golden_mentions": write(
            "golden_mentions",
            golden_pdf,
            pa.schema(
                [
                    ("repo", pa.string()),
                    ("path", pa.string()),
                    ("commit", pa.string()),
                    ("start", pa.int32()),
                    ("end", pa.int32()),
                    ("text", pa.string()),
                    ("mtype", pa.string()),
                    ("compound_id", pa.int64()),
                ]
            ),
        ),
        "golden_triples": write("golden_triples", triples_pdf),
        "golden_links": write(
            "golden_links",
            links_pdf,
            pa.schema(
                [
                    ("repo", pa.string()),
                    ("path", pa.string()),
                    ("commit", pa.string()),
                    ("start", pa.int32()),
                    ("end", pa.int32()),
                    ("method", pa.string()),
                ]
            ),
        ),
        "manifest": write("manifest", pd.DataFrame(manifest)),
    }

    golden_csv = triples_pdf.to_csv(index=False)
    meta = {
        "scale": scale,
        "seed": SEED,
        "n_files": n_files,
        "n_structures": n_structures,
        "rows": counts,
        "golden_triples_sha256": hashlib.sha256(golden_csv.encode()).hexdigest(),
    }
    (out / "manifest.json").write_text(json.dumps(meta, indent=2))
    return meta


_TABLES = (
    "source_files",
    "compound_dict",
    "golden_mentions",
    "golden_triples",
    "golden_links",
    "manifest",
)


def ensure(scale: str, base: str | Path = "/root/repo/tests/fixtures") -> Path:
    """Generate-if-missing; returns the fixture directory.  A fixture dir
    from an older generator version (any expected table absent) is
    regenerated wholesale — partial staleness must never survive."""
    out = Path(base) / scale
    complete = (out / "manifest.json").exists() and all(
        (out / f"{t}.parquet").exists() for t in _TABLES
    )
    if not complete:
        generate(scale, out)
    return out


if __name__ == "__main__":
    import sys

    sc = sys.argv[1] if len(sys.argv) > 1 else "small"
    meta = generate(sc, Path("/root/repo/tests/fixtures") / sc)
    print(json.dumps(meta, indent=2))
