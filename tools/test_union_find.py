#!/usr/bin/env python3
"""Property test for oracle_check's min-label union-find replacement.

oracle_check.py substitutes `_min_label_components` for the q27/q31
recursive-CTE connected components (the CTE is super-linear in component
size and ground >4h at sf1). The substitution guards two queries'
correctness, so prove it equivalent on random graphs against the ORIGINAL
CTE shape (e / reach / cc, verbatim from q27's oracle SQL) run in DuckDB
at tiny n, across seeds and edge densities — singletons, chains, cliques,
and disconnected unions all occur at these sizes.

Run: python3 tools/test_union_find.py  (exit 0 = equivalent on all cases)
"""
import random
import sys

import duckdb

from oracle_check import _min_label_components

# q27's oracle CTE verbatim from the `e` stage down (pairs come from a
# plain edges table here instead of the Jaccard join — _count_jaccard_pairs
# is separately validated row-identical at sf0.01/sf0.1).
CTE = """
WITH RECURSIVE
e AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
reach(id, comp) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, r.comp FROM e JOIN reach r ON e.b = r.id),
cc AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
SELECT id, comp FROM cc ORDER BY id
"""


def case(rng):
    n = rng.randint(1, 30)
    density = rng.choice([0.3, 1.0, 2.0, 4.0])  # sparse .. near-clique
    m = int(n * density)
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in ((rng.randrange(n), rng.randrange(n))
                                 for _ in range(m)) if a != b})
    return n, pairs


def main():
    rng = random.Random(20260818)
    failures = 0
    for seed in range(40):
        n, pairs = case(rng)
        con = duckdb.connect()
        con.execute("CREATE TABLE edges(a BIGINT, b BIGINT)")
        if pairs:
            con.executemany("INSERT INTO edges VALUES (?, ?)", pairs)
        cte = sorted(con.execute(CTE).fetchall())
        con.close()

        find = _min_label_components(pairs)
        nodes = sorted({i for ab in pairs for i in ab})
        uf = [(i, find(i)) for i in nodes]

        ok = cte == uf
        print(f"case {seed:2d}: n={n:2d} edges={len(pairs):3d} "
              f"comps={len({c for _, c in uf}):3d} "
              f"{'PASS' if ok else 'FAIL'}")
        if not ok:
            failures += 1
            print(f"  CTE: {cte}\n  UF : {uf}")
    print(f"== {40 - failures} pass, {failures} fail ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
