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


def connected_components_rows(con, sql):
    """Exact replacement for q27's recursive-CTE connected components.

    DuckDB's recursive CTE materializes, for every node, every (node,
    reachable-comp) pair before the min() — super-linear in component
    size; at sf1 (50k docs) it ground >4h while the Spark side ran in
    seconds. This path is value-identical and near-linear past the pair
    join: evaluate the oracle's own pair CTE `p` in DuckDB (with the
    quadratic all-pairs join narrowed to shared-shingle candidates —
    exact, since Jaccard >= 0.8 > 0 requires at least one shared
    shingle), then min-label union-find in Python (root = component
    minimum, matching the CTE's min(comp)), then the same
    left-join-onto-documents coalesce. Falls back loudly (ValueError)
    if the oracle SQL's text no longer matches the expected CTE shape.
    """
    cut = sql.index("p AS (")
    head = sql[:cut]
    import re
    thr = re.search(
        r"/ len\(list_distinct\(list_concat\(a\.sh, b\.sh\)\)\) >= ([0-9.]+)", sql)
    if thr is None:
        raise ValueError("q27 oracle SQL changed; update connected_components_rows")
    # Count-based Jaccard, value-identical to the oracle's pair CTE `p`
    # because each doc's `sh` is a SET (list_distinct / single element):
    # |A∩B| = per-pair count of shared shingles, |A∪B| = |A|+|B|−|A∩B|.
    # The all-pairs join with per-pair list_intersect is O(n²) in docs and
    # O(len) per pair; this is one unnest join (candidates only — Jaccard
    # > 0 needs a shared shingle) into a hash aggregate, no list ops.
    pairs = con.execute(head + f"""p AS (
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
    docs = con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()
    return ["doc_id", "cluster_id"], [(d[0], find(d[0])) for d in docs]


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
            # only the STANDALONE connected-components query (q27) takes the
            # union-find path — q31 embeds the same recursive CTE as an
            # inner stage and must run its own SQL unchanged
            if ("reach(id, comp) AS (" in sql and sql.rstrip().endswith(
                    "LEFT JOIN cc ON documents.doc_id = cc.id\nORDER BY doc_id")):
                o_cols, o_rows = connected_components_rows(con, sql)
            else:
                orc = con.execute(sql)
                o_cols = [d[0] for d in orc.description]
                o_rows = orc.fetchall()
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
