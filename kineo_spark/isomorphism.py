"""Blank-node-isomorphism result comparison (test-harness oracle).

Reference: W3C test results compare as sets with blank-node labels
matched by permutation (QuadStore.swift:405-580). Searching all
permutations is exponential; we use iterative signature refinement
(1-WL style): each blank node's label is refined by the multiset of its
(column/position, neighbor-signature) context until stable, then rows
canonicalize by signature. Complete for the result shapes W3C tests use
(distinguishable bnodes); symmetric automorphism cases fall back to a
small permutation search.
"""

from __future__ import annotations

import itertools
from hashlib import md5

KIND_BLANK = 1


def _canon_rows(rows: list[dict], bnode_sig: dict[str, str]) -> list[tuple]:
    out = []
    for row in rows:
        vals = []
        for k in sorted(row):
            t = row[k]
            if t is None:
                vals.append((k, None))
            elif t[0] == KIND_BLANK:
                vals.append((k, ("B", bnode_sig[t[1]])))
            else:
                vals.append((k, tuple(t)))
        out.append(tuple(vals))
    return sorted(out)


def _refine(rows: list[dict]) -> dict[str, str]:
    """Signature refinement for blank node labels based on co-occurrence
    context within rows."""
    labels = {
        t[1]
        for row in rows
        for t in row.values()
        if t is not None and t[0] == KIND_BLANK
    }
    sig = {b: "b" for b in labels}
    for _ in range(len(labels) + 2):
        nxt = {}
        ctx: dict[str, list] = {b: [] for b in labels}
        for row in rows:
            for k in sorted(row):
                t = row[k]
                if t is not None and t[0] == KIND_BLANK:
                    others = []
                    for k2 in sorted(row):
                        if k2 == k:
                            continue
                        o = row[k2]
                        if o is None:
                            others.append((k2, None))
                        elif o[0] == KIND_BLANK:
                            others.append((k2, sig[o[1]]))
                        else:
                            others.append((k2, tuple(o)))
                    ctx[t[1]].append((k, tuple(others)))
        for b in labels:
            nxt[b] = md5(repr((sig[b], sorted(ctx[b]))).encode()).hexdigest()
        if nxt == sig:
            break
        sig = nxt
    return sig


def _terms_of_row(row, columns) -> dict:
    out = {}
    for c in columns:
        v = row[c]
        out[c] = None if v is None else (v["kind"], v["lex"], v["dt"], v["lang"])
    return out


def bindings_isomorphic(df_a, df_b) -> bool:
    """Compare two binding DataFrames as multisets modulo blank-node
    relabeling."""
    ca = [c for c in df_a.columns if not c.startswith("__")]
    cb = [c for c in df_b.columns if not c.startswith("__")]
    if sorted(ca) != sorted(cb):
        return False
    ra = [_terms_of_row(r, ca) for r in df_a.collect()]
    rb = [_terms_of_row(r, cb) for r in df_b.collect()]
    if len(ra) != len(rb):
        return False
    sa, sb = _refine(ra), _refine(rb)
    if _canon_rows(ra, sa) == _canon_rows(rb, sb):
        return True
    # symmetric-automorphism fallback: try permutations of same-signature
    # groups (tiny in practice)
    groups_a: dict[str, list[str]] = {}
    for b, s in sa.items():
        groups_a.setdefault(s, []).append(b)
    amb = [g for g in groups_a.values() if len(g) > 1]
    if not amb or sum(len(g) for g in amb) > 8:
        return False
    base = _canon_rows(rb, sb)
    for perm_sets in itertools.product(*[itertools.permutations(g) for g in amb]):
        remap = dict(sa)
        for orig_group, permuted in zip(amb, perm_sets):
            for o, p in zip(orig_group, permuted):
                remap[o] = sa[p]
        if _canon_rows(ra, remap) == base:
            return True
    return False
