"""Blank-node-aware RDF graph isomorphism for test comparison.

Python analogue of the ``toBeRdfIsomorphic`` matcher the reference's
test suite uses (test/MicrodataRdfParser-test.ts:174-177 etc.).
Graphs in the golden fixtures are tiny, so signature refinement plus
bounded backtracking over blank-label bijections is plenty.
"""

from __future__ import annotations

from itertools import permutations


def _is_blank(term: str) -> bool:
    return term.startswith("_:")


def _normalize(triples) -> list[tuple]:
    """Normalize to hashable (subj, pred, obj, kind, lang, dt) tuples."""
    out = []
    for t in triples:
        subj, pred, obj, kind, lang, dt = (
            t[0],
            t[1],
            t[2],
            t[3],
            t[4] if len(t) > 4 else None,
            t[5] if len(t) > 5 else None,
        )
        out.append((subj, pred, obj, kind, lang or None, dt or None))
    return out


def _blanks(triples) -> set[str]:
    labels = set()
    for s, _p, o, kind, _l, _d in triples:
        if _is_blank(s):
            labels.add(s)
        if kind == "blank":
            labels.add(o)
    return labels


def _signature(triples, label: str) -> tuple:
    """Order-invariant local signature of one blank node (1-hop)."""
    sig = []
    for s, p, o, kind, lang, dt in triples:
        s_b, o_b = _is_blank(s), kind == "blank"
        if s == label:
            sig.append(("s", p, "?" if o_b else o, kind, lang, dt))
        if kind == "blank" and o == label:
            sig.append(("o", p, "?" if s_b else s))
    return tuple(sorted(map(str, sig)))


def _apply(triples, mapping) -> set:
    # RDF graphs are SETS of triples: duplicates (e.g. from overlapping
    # itemref replays) are collapsed, matching rdf-isomorphic.
    out = set()
    for s, p, o, kind, lang, dt in triples:
        s2 = mapping.get(s, s) if _is_blank(s) else s
        o2 = mapping.get(o, o) if kind == "blank" else o
        out.add((s2, p, o2, kind, lang, dt))
    return out


def is_isomorphic(triples_a, triples_b) -> bool:
    a, b = _normalize(triples_a), _normalize(triples_b)
    blanks_a, blanks_b = sorted(_blanks(a)), sorted(_blanks(b))
    if len(blanks_a) != len(blanks_b):
        return False
    target = _apply(b, {lbl: lbl for lbl in blanks_b})

    if not blanks_a:
        return _apply(a, {}) == target

    # Group candidates by signature to prune the search.
    sig_a = {lbl: _signature(a, lbl) for lbl in blanks_a}
    sig_b: dict[tuple, list[str]] = {}
    for lbl in blanks_b:
        sig_b.setdefault(_signature(b, lbl), []).append(lbl)
    if sorted(sig_a.values()) != sorted(
        s for s, ls in sig_b.items() for _ in ls
    ):
        return False

    groups: dict[tuple, list[str]] = {}
    for lbl in blanks_a:
        groups.setdefault(sig_a[lbl], []).append(lbl)

    def backtrack(group_items, mapping):
        if not group_items:
            return _apply(a, mapping) == target
        sig, a_labels = group_items[0]
        for perm in permutations(sig_b[sig]):
            mapping2 = dict(mapping)
            for x, y in zip(a_labels, perm):
                mapping2[x] = y
            if backtrack(group_items[1:], mapping2):
                return True
        return False

    return backtrack(list(groups.items()), {})


def diff_summary(triples_a, triples_b) -> str:
    """Human-readable diff (exact string match, blanks as-is) for
    pytest failure messages."""
    a = set(map(str, _normalize(triples_a)))
    b = set(map(str, _normalize(triples_b)))
    only_a = sorted(a - b)
    only_b = sorted(b - a)
    return "only in actual:\n  " + "\n  ".join(only_a) + "\nonly in expected:\n  " + "\n  ".join(only_b)
