"""The "paper oracle" (FIXTURES.md §A4): a tiny single-process pandas/python
implementation of the pipeline SEMANTICS, used only to derive golden triples
from golden mentions + the dictionary.  It shares no code with the Spark
pipeline under test (kgx.stages / kgx.canon) beyond the URI conventions and
the fuzzy-acceptance scoring primitives (_pair_score + thresholds from
kgx.link.rerank, batch_band_hashes from kgx.link.minhash) — shared
deliberately so the golden fuzzy gate is the SAME decision function the
pipeline applies, not an approximation that diverges on organic lev-2
coincidences (round-2 advisory).

Conventions (FIXTURES.md §A4):
  subj/obj URIs: ``doc:<repo>/<path>@<commit>``, ``cpd:<compound_id>``,
  ``repo:<repo>``; smiles/inchi as plain literals.
"""

from __future__ import annotations

import pandas as pd


def doc_uri(repo: str, path: str, commit: str) -> str:
    return f"doc:{repo}/{path}@{commit}"


def cpd_uri(compound_id: int) -> str:
    return f"cpd:{compound_id}"


def repo_uri(repo: str) -> str:
    return f"repo:{repo}"


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def derive_golden_links(
    golden_mentions: pd.DataFrame, compound_dict: pd.DataFrame
) -> pd.DataFrame:
    """Expected LINK rows (span + method) per golden mention — an
    independent pandas mirror of the 5-step linking cascade
    (kgx.stages.link: exact > systematic > synonym > abbrev > fuzzy, with
    the exact/synonym broadcast join consulted FIRST, systematic-skeleton
    only for unmatched SYSTEMATIC mentions, fuzzy only for those that also
    miss the skeleton).  Mentions no method resolves yield no row —
    mirroring the pipeline, which drops unresolved mentions.

    Hard negatives (compound_id == null goldens) ARE included when a
    method fires on their surface: the pipeline links them too — that is
    exactly the precision cost they exist to charge.
    """
    from kgx.text.normalize import norm_term, skeleton

    # term map, mirroring link._unique_terms: one (compound, kind) per
    # normalized surface, minimum (compound_id, kind) wins
    entries: list[tuple[str, int, str]] = []
    for r in compound_dict.itertuples(index=False):
        cid = int(r.compound_id)
        entries.append((norm_term(r.canonical_name), cid, "canonical"))
        for s in r.synonyms if r.synonyms is not None else []:
            entries.append((norm_term(s), cid, "synonym"))
        if isinstance(r.formula, str) and r.formula:
            entries.append((norm_term(r.formula), cid, "formula"))
        cas = getattr(r, "cas", None)
        if isinstance(cas, str) and cas:
            entries.append((norm_term(cas), cid, "identifier"))
    term_map: dict[str, tuple[int, str]] = {}
    for norm, cid, kind in sorted(entries, key=lambda e: (e[0], e[1], e[2])):
        term_map.setdefault(norm, (cid, kind))

    # skeleton index: SYSTEMATIC-mtype surfaces only (canonical + synonyms
    # of systematic compounds carry name_type SYSTEMATIC)
    skel_set: set[str] = set()
    for r in compound_dict.itertuples(index=False):
        if r.name_type != "SYSTEMATIC":
            continue
        skel_set.add(skeleton(r.canonical_name))
        for s in r.synonyms if r.synonyms is not None else []:
            skel_set.add(skeleton(s))

    # fuzzy gate mirror — faithful to the pipeline's full channel (round-2
    # advisory): candidates come from BOTH signature families the join uses
    # (deletion-1 neighborhood, kgx.link.symdel, covering every ≤1-edit
    # corruption deterministically; AND minhash LSH bands, kgx.link.minhash,
    # covering moderate-Jaccard lev-2 pairs), then pass the join's
    # length/levenshtein gates AND the rerank acceptance threshold
    # (_pair_score ≥ FUZZY_SCALE·MIN_SCORE) — the same score the pipeline
    # applies, so organic lev-2 coincidences are accepted/rejected
    # identically.  An O(|surfaces|) levenshtein scan per mention would be
    # O(10^10) at the scaling corpus; both indexes are O(len) / O(BANDS)
    # lookups per DISTINCT surface instead.
    from kgx.link.minhash import batch_band_hashes
    from kgx.link.rerank import FUZZY_SCALE, MAX_LEV, MIN_SCORE, _pair_score

    fuzzy_surfaces = sorted(
        {norm for norm, _cid, kind in entries if kind not in ("formula", "identifier")}
    )
    sig_to_terms: dict[str, list[str]] = {}
    for t in fuzzy_surfaces:
        for sig in {t, *(t[:i] + t[i + 1 :] for i in range(len(t)))}:
            sig_to_terms.setdefault(sig, []).append(t)
    band_to_terms: dict[int, list[str]] = {}
    for t, bands in zip(fuzzy_surfaces, batch_band_hashes(fuzzy_surfaces)):
        for b in set(bands):
            band_to_terms.setdefault(b, []).append(t)

    fuzzy_memo: dict[str, bool] = {}

    def fuzzy_hits(norm: str) -> bool:
        hit = fuzzy_memo.get(norm)
        if hit is not None:
            return hit
        cands: set[str] = set()
        for sig in {norm, *(norm[:i] + norm[i + 1 :] for i in range(len(norm)))}:
            cands.update(sig_to_terms.get(sig, ()))
        for b in set(batch_band_hashes([norm])[0]):
            cands.update(band_to_terms.get(b, ()))
        hit = False
        for t in cands:
            if abs(len(norm) - len(t)) > MAX_LEV:
                continue
            lev, score = _pair_score(norm, t)
            if lev <= MAX_LEV and score >= FUZZY_SCALE * MIN_SCORE:
                hit = True
                break
        fuzzy_memo[norm] = hit
        return hit

    rows = []
    for r in golden_mentions.itertuples(index=False):
        norm = norm_term(r.text)
        if r.mtype == "ABBREVIATION":
            method = "abbrev"  # defined_as long form is planted in-lexicon
        elif norm in term_map:
            method = "synonym" if term_map[norm][1] == "synonym" else "exact"
        elif r.mtype == "SYSTEMATIC" and skeleton(norm) in skel_set:
            method = "systematic"
        elif r.mtype == "SYSTEMATIC" and fuzzy_hits(norm):
            method = "fuzzy"
        else:
            continue  # unresolved: the pipeline emits no link row
        rows.append((r.repo, r.path, r.commit, int(r.start), int(r.end), method))

    return (
        pd.DataFrame(rows, columns=["repo", "path", "commit", "start", "end", "method"])
        .sort_values(["repo", "path", "commit", "start", "end"])
        .reset_index(drop=True)
    )


def derive_golden_triples(
    golden_mentions: pd.DataFrame, compound_dict: pd.DataFrame
) -> pd.DataFrame:
    """golden mentions (with non-null compound_id = the intended link) +
    dictionary -> expected (subj, pred, obj) rows, sorted & distinct."""
    links = golden_mentions[golden_mentions["compound_id"].notna()].copy()
    links["compound_id"] = links["compound_id"].astype("int64")

    # components over compounds: dictionary entries sharing an inchikey are
    # the same structure (duplicate lexicon entries -> synonymOf edges)
    uf = _UnionFind()
    for cid in compound_dict["compound_id"]:
        uf.find(int(cid))
    for _, grp in compound_dict.groupby("inchikey"):
        ids = sorted(int(c) for c in grp["compound_id"])
        for other in ids[1:]:
            uf.union(ids[0], other)

    comp_of = {int(c): uf.find(int(c)) for c in compound_dict["compound_id"]}

    # representative per component: min (priority, compound_id)
    cd = compound_dict.set_index("compound_id", drop=False)
    rep_of_comp: dict[int, int] = {}
    for cid in sorted(comp_of):
        comp = comp_of[cid]
        key = (int(cd.at[cid, "priority"]), cid)
        cur = rep_of_comp.get(comp)
        if cur is None or key < (int(cd.at[cur, "priority"]), cur):
            rep_of_comp[comp] = cid

    mentioned_comps = {comp_of[int(c)] for c in links["compound_id"]}

    rows: list[tuple[str, str, str]] = []
    for r in links.itertuples(index=False):
        rep = rep_of_comp[comp_of[int(r.compound_id)]]
        d = doc_uri(r.repo, r.path, r.commit)
        rows.append((d, "mentions", cpd_uri(rep)))
        rows.append((cpd_uri(rep), "foundInRepo", repo_uri(r.repo)))

    for comp in sorted(mentioned_comps):
        rep = rep_of_comp[comp]
        smiles = cd.at[rep, "smiles"]
        inchi = cd.at[rep, "inchi"]
        if isinstance(smiles, str) and smiles:
            rows.append((cpd_uri(rep), "hasSMILES", smiles))
        if isinstance(inchi, str) and inchi:
            rows.append((cpd_uri(rep), "hasInChI", inchi))
        members = sorted(c for c, cm in comp_of.items() if cm == comp)
        for c in members:
            if c != rep:
                rows.append((cpd_uri(c), "synonymOf", cpd_uri(rep)))

    out = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    out = out.drop_duplicates().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    return out
