#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers the
testdata parquet tables as DuckDB views, runs each oracle query, and compares
against the Spark parquet result at <verifyOutDir>/<name>/ — columns sorted by
name, rows sorted, exact value compare (with a float report on mismatch).
"""
import glob
import json
import math
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(repr(x) for x in t)), [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if hasattr(a, "timestamp") and hasattr(b, "timestamp"):
        return a.timestamp() == b.timestamp()
    return a == b


def _count_jaccard_pairs(con, sql):
    """Evaluate the oracle's pair CTE `p` (all-pairs shingle Jaccard)
    as a count-based Jaccard: one unnest join (candidates only — Jaccard
    > 0 needs a shared shingle) into a hash aggregate, no per-pair list
    ops. Value-identical because each doc's `sh` is a SET (list_distinct
    / single element): |A∩B| = per-pair shared-shingle count and
    |A∪B| = |A|+|B|−|A∩B|. The SQL text before `p AS (` (tokenize /
    shingle / any dedup prefix) is reused verbatim.
    """
    head = sql[:sql.index("\np AS (") + 1]  # \n anchor: "fp AS (" must not match
    thr = re.search(
        r"/ len\(list_distinct\(list_concat\(a\.sh, b\.sh\)\)\) >= ([0-9.]+)", sql)
    if thr is None:
        raise ValueError("pair-CTE oracle SQL changed; update _count_jaccard_pairs")
    return con.execute(head + f"""p AS (
  WITH x AS (SELECT doc_id, unnest(sh) AS g FROM s),
  sz AS (SELECT doc_id, len(sh) AS n FROM s),
  shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
    FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2)
  SELECT id_a, id_b
  FROM shared
  JOIN sz za ON za.doc_id = id_a
  JOIN sz zb ON zb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / (za.n + zb.n - c) >= {thr.group(1)})
SELECT id_a, id_b FROM p""").fetchall()


def _min_label_components(pairs):
    """Min-label union-find (root = component minimum), matching the
    recursive CTE's min(comp) over undirected reachability. Returns a
    find() closure defaulting unseen ids to themselves."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return find


def connected_components_rows(con, sql):
    """Exact replacement for q27's recursive-CTE connected components.

    DuckDB's recursive CTE materializes, for every node, every (node,
    reachable-comp) pair before the min() — super-linear in component
    size; at sf1 (50k docs) it ground >4h while the Spark side ran in
    seconds. This path is value-identical and near-linear past the pair
    join: the count-based pair evaluation, min-label union-find, then
    the same left-join-onto-documents coalesce. Validated row-identical
    to the CTE at sf0.01 and sf0.1."""
    find = _min_label_components(_count_jaccard_pairs(con, sql))
    docs = con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()
    return ["doc_id", "cluster_id"], [(d[0], find(d[0])) for d in docs]


def cleaned_corpus_rows(con, sql):
    """Exact replacement for q31's EMBEDDED recursive-CTE stage: the
    cleaning pipeline runs exact-dedup → near-dup clustering → language/
    quality scoring; only the p/e/reach/cc CTEs are replaced. Pairs come
    from the count-based evaluation over the oracle's own prefix (which
    includes the exact-dedup `ex` the shingle CTE reads), components from
    the same union-find, injected as temp table cc_py; the rest of the
    oracle SQL runs unchanged against it."""
    pairs = _count_jaccard_pairs(con, sql)
    find = _min_label_components(pairs)
    # cc covered exactly the nodes appearing in some edge — mirror that
    ids = {i for ab in pairs for i in ab}
    con.execute("CREATE OR REPLACE TEMP TABLE cc_py(id BIGINT, comp BIGINT)")
    con.executemany("INSERT INTO cc_py VALUES (?, ?)",
                    [(i, find(i)) for i in sorted(ids)])
    rest = sql[sql.index("\nreps AS (") + 1:]
    rest = (rest.replace("LEFT JOIN cc ON", "LEFT JOIN cc_py ON")
                .replace("cc.id", "cc_py.id").replace("cc.comp", "cc_py.comp"))
    head = sql[:sql.index("\np AS (") + 1]
    out = con.execute(head + rest)
    return [d[0] for d in out.description], out.fetchall()


def oracle_rows(con, sql):
    """cols, rows for one oracle query — the recursive-CTE connected-
    components shapes (standalone q27, embedded q31) take the exact
    union-find replacements; everything else runs as-is."""
    if "reach(id, comp) AS (" in sql:
        # q27's trailing ORDER BY was dropped in round 12 (row-sorted
        # compare makes it dead weight) — match either ending
        if sql.rstrip().endswith("LEFT JOIN cc ON documents.doc_id = cc.id") \
                or sql.rstrip().endswith(
                "LEFT JOIN cc ON documents.doc_id = cc.id\nORDER BY doc_id"):
            return connected_components_rows(con, sql)
        if "reps AS (" in sql:
            return cleaned_corpus_rows(con, sql)
    orc = con.execute(sql)
    return [d[0] for d in orc.description], orc.fetchall()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; ScaleUp output (sf1) is a
        # Spark directory of part files — register either layout
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            o_cols, o_rows = oracle_rows(con, sql)
            src = con.execute(
                "SELECT * FROM read_parquet(?)", [parts])
            s_cols = [d[0] for d in src.description]
            s_rows = src.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        o_rows, o_cols_s = canon(o_rows, o_cols)
        s_rows, s_cols_s = canon(s_rows, s_cols)
        if o_cols_s != s_cols_s:
            print(f"FAIL {name}: columns oracle={o_cols_s} spark={s_cols_s}")
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (orow, srow) in enumerate(zip(o_rows, s_rows)):
            for j, (a, b) in enumerate(zip(orow, srow)):
                if not eq(a, b):
                    bad = (i, o_cols_s[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(o_rows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
