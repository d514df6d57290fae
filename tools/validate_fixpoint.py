"""Fixpoint twins for the unrolled pinned-round oracles.

The registered oracle_sql() strings for the fixpoint-family rows
(onion_layers, mis, trussness) unroll a PINNED number of peel/Luby
rounds — pinned past the measured engine fixpoint at the driver-gate
scale factors (sf0.001, sf0.01).  At larger inputs the true fixpoint
can exceed the pin and the unrolled chain silently truncates (exactly
the ADVICE-r4 strength_core_sweep hazard class; observed at sf0.1 in
BENCH/gate_replica_r5_sf0.1_tail.txt: onion 1781/20000 rows, mis one
undecided vertex, trussness 46 under-peeled edges).

This tool runs the SAME per-round SQL as each oracle but loops it in
Python over DuckDB temp tables UNTIL CONVERGENCE, so the comparison is
valid at ANY scale factor, and it reports the measured fixpoint round
counts — the evidence used to re-pin the registered oracles.

Usage: python tools/validate_fixpoint.py [sf_dir] [row ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from plato_spark.session import get_spark  # noqa: E402
from plato_spark.sources.tables import TABLES  # noqa: E402
from tools.validate_oracles import normalize  # noqa: E402

MD5_PRI = (
    "(CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 14)) AS BIGINT)"
    " % 2147483648) * 2147483648 + id"
)


def setup_graph(con) -> None:
    """Materialize the SQL_GRAPH_PREFIX contract as temp tables."""
    con.execute("""CREATE TEMP TABLE canon AS
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(count(*) AS DOUBLE) AS weight
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey""")
    con.execute("""CREATE TEMP TABLE edges AS
      SELECT src, dst, weight FROM canon
      UNION ALL SELECT dst AS src, src AS dst, weight FROM canon""")
    con.execute(
        "CREATE TEMP TABLE verts AS SELECT DISTINCT src AS id FROM edges")


def duck_onion(con):
    """(id, layer, core) — mirror of entry/common._sql_onion's per-round
    SQL, looped to the empty remainder instead of ONION_SQL_ROUNDS."""
    con.execute("CREATE TEMP TABLE rem AS SELECT id FROM verts")
    out, kk, r = [], 0, 0
    while True:
        n = con.execute("SELECT count(*) FROM rem").fetchone()[0]
        if n == 0:
            break
        r += 1
        con.execute("""CREATE OR REPLACE TEMP TABLE dg AS
          SELECT v.id, COALESCE(d.cnt, 0) AS dg
          FROM rem v LEFT JOIN (
            SELECT e.src AS id, CAST(count(*) AS BIGINT) AS cnt
            FROM edges e JOIN rem a ON e.src = a.id
                         JOIN rem b ON e.dst = b.id
            GROUP BY e.src) d ON v.id = d.id""")
        mn = con.execute("SELECT min(dg) FROM dg").fetchone()[0]
        kk = max(kk, mn if mn is not None else kk)
        out += con.execute(
            f"SELECT id, CAST({r} AS BIGINT), CAST({kk} AS BIGINT) "
            f"FROM dg WHERE dg <= {kk}").fetchall()
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE rem AS "
            f"SELECT id FROM dg WHERE dg > {kk}")
    return out, ["id", "layer", "core"], r


def duck_mis(con):
    """(id, mis_round) — mirror of entry/common._sql_mis's Luby round,
    looped to the empty alive set."""
    con.execute(
        f"CREATE TEMP TABLE alive AS SELECT id, {MD5_PRI} AS p FROM verts")
    con.execute(
        "CREATE TEMP TABLE ee AS SELECT src, dst FROM edges")
    out, k = [], 0
    while True:
        n = con.execute("SELECT count(*) FROM alive").fetchone()[0]
        if n == 0:
            break
        con.execute("""CREATE OR REPLACE TEMP TABLE won AS
          SELECT a.id FROM alive a LEFT JOIN (
            SELECT e.dst AS id, min(ap.p) AS minp
            FROM ee e JOIN alive ap ON e.src = ap.id GROUP BY e.dst) nb
          ON a.id = nb.id
          WHERE nb.minp IS NULL OR a.p < nb.minp""")
        out += con.execute(
            f"SELECT id, CAST({k} AS INTEGER) FROM won").fetchall()
        con.execute("""CREATE OR REPLACE TEMP TABLE alive2 AS
          SELECT a.id, a.p FROM alive a
          WHERE NOT EXISTS (SELECT 1 FROM won w WHERE w.id = a.id)
            AND NOT EXISTS (
              SELECT 1 FROM ee e JOIN won m ON e.src = m.id
              WHERE e.dst = a.id)""")
        con.execute("CREATE OR REPLACE TEMP TABLE alive AS "
                    "SELECT * FROM alive2")
        con.execute("""CREATE OR REPLACE TEMP TABLE ee AS
          SELECT e.src, e.dst FROM ee e
          JOIN alive x ON e.src = x.id JOIN alive y ON e.dst = y.id""")
        k += 1
    return out, ["id", "mis_round"], k


def duck_trussness(con, k_max: int = 6):
    """(src, dst, trussness) — mirror of entry/common._sql_trussness's
    phased support-peel, each phase looped to its own fixpoint."""
    con.execute("CREATE TEMP TABLE te AS SELECT src, dst FROM canon")
    phase_rounds = []
    flags = []
    for k in range(3, k_max + 1):
        r = 0
        while True:
            before = con.execute("SELECT count(*) FROM te").fetchone()[0]
            con.execute("""CREATE OR REPLACE TEMP TABLE sy AS
              SELECT src, dst FROM te
              UNION ALL SELECT dst AS src, src AS dst FROM te""")
            con.execute("""CREATE OR REPLACE TEMP TABLE te2 AS
              SELECT e.src, e.dst FROM te e
              JOIN (SELECT a.src AS u, b.src AS v, count(*) AS c
                    FROM sy a JOIN sy b
                      ON a.dst = b.dst AND a.src < b.src
                    GROUP BY a.src, b.src) s
                ON e.src = s.u AND e.dst = s.v
              WHERE s.c >= %d""" % (k - 2))
            con.execute("CREATE OR REPLACE TEMP TABLE te AS "
                        "SELECT * FROM te2")
            after = con.execute("SELECT count(*) FROM te").fetchone()[0]
            r += 1
            if after == before:
                break
        phase_rounds.append(r)
        con.execute(f"CREATE OR REPLACE TEMP TABLE p{k} AS "
                    f"SELECT src, dst FROM te")
        flags.append(
            f"CASE WHEN m{k}.src IS NOT NULL THEN 1 ELSE 0 END")
    joins = "\n".join(
        f"LEFT JOIN p{k} m{k} ON c.src = m{k}.src AND c.dst = m{k}.dst"
        for k in range(3, k_max + 1))
    out = con.execute(f"""
      SELECT c.src, c.dst, CAST(2 + {' + '.join(flags)} AS INT)
      FROM canon c
      {joins}""").fetchall()
    return out, ["src", "dst", "trussness"], phase_rounds


def duck_ktruss(con, k: int = 5):
    """(src, dst) — the maximal k-truss by the SAME per-round support
    peel as entry/common._sql_ktruss, looped to the fixpoint instead of
    the unrolled KTRUSS_SQL_ITERS chain (whose MATERIALIZED round count
    is cost-prohibitive at sf0.1) — the single-phase k=5 special case
    of duck_trussness's loop."""
    con.execute("CREATE OR REPLACE TEMP TABLE ke AS "
                "SELECT src, dst FROM canon")
    r = 0
    while True:
        before = con.execute("SELECT count(*) FROM ke").fetchone()[0]
        con.execute("""CREATE OR REPLACE TEMP TABLE ksy AS
          SELECT src, dst FROM ke
          UNION ALL SELECT dst AS src, src AS dst FROM ke""")
        con.execute("""CREATE OR REPLACE TEMP TABLE ke2 AS
          SELECT e.src, e.dst FROM ke e
          JOIN (SELECT a.src AS u, b.src AS v, count(*) AS c
                FROM ksy a JOIN ksy b
                  ON a.dst = b.dst AND a.src < b.src
                GROUP BY a.src, b.src) s
            ON e.src = s.u AND e.dst = s.v
          WHERE s.c >= %d""" % (k - 2))
        con.execute("CREATE OR REPLACE TEMP TABLE ke AS SELECT * FROM ke2")
        after = con.execute("SELECT count(*) FROM ke").fetchone()[0]
        r += 1
        if after == before:
            break
    out = con.execute("SELECT src, dst FROM ke ORDER BY src, dst").fetchall()
    return out, ["src", "dst"], [r]


TWINS = {
    "onion_layers": duck_onion,
    "mis": duck_mis,
    "trussness": duck_trussness,
    "ktruss": duck_ktruss,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or set(TWINS)
    import subprocess
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        sha, dirty = "unknown", ""
    print(f"# validate_fixpoint @ git {sha}{'+dirty' if dirty else ''} | "
          f"sf_dir {sf_dir} | rows {sorted(only)} | "
          f"{time.strftime('%Y-%m-%dT%H:%M:%S')}")
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    setup_graph(con)
    qs = entrymod.queries()
    failures = 0
    for name, twin in TWINS.items():
        if name not in only:
            continue
        t0 = time.time()
        d_rows, d_cols, rounds = twin(con)
        d_sec = time.time() - t0
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        s_sec = time.time() - t0
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: schema {sorted(s_cols)} vs {sorted(d_cols)}")
            failures += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} "
                  f"duck={len(d_rows)} (fixpoint rounds {rounds})")
            failures += 1
            continue
        _, ns = normalize(s_rows, s_cols)
        _, nd = normalize(d_rows, d_cols)
        bad = sum(1 for a, b in zip(ns, nd) if a != b)
        if bad:
            for a, b in zip(ns, nd):
                if a != b:
                    print(f"   diff: spark={a} duck={b}")
                    break
            print(f"FAIL {name}: {bad}/{len(ns)} rows differ "
                  f"(fixpoint rounds {rounds})")
            failures += 1
        else:
            print(f"ok   {name}: {len(ns)} rows match | fixpoint rounds "
                  f"{rounds} [spark {s_sec:.1f}s, duck {d_sec:.1f}s]")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
