"""Round-4 batch 49: bond percolation sweep, self-join size audit."""

import datetime
import hashlib

from plato_spark.algos.percolation import bond_percolation_sweep


def _h1(s):
    return int(hashlib.md5(s.encode()).hexdigest()[0:14], 16)


def test_bond_percolation_nested_and_exact(spark):
    # clique K5: verify each sweep level against a hashlib+union-find
    # mirror, and that survivor sets are nested across levels
    edges = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    canon = spark.createDataFrame(edges, "src long, dst long")
    out = {r.p_pct: r for r in
           bond_percolation_sweep(canon, ps=(25, 50, 75)).collect()}

    def survivors(p):
        return [e for e in edges
                if _h1(f"bond|{e[0]}:{e[1]}") % 100 < p]

    prev = set()
    for p in (25, 50, 75):
        sur = survivors(p)
        assert prev <= set(sur)  # nested coupling
        prev = set(sur)
        # union-find mirror
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in sur:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comps = {}
        for a, b in sur:
            for v in (a, b):
                comps.setdefault(find(v), set()).add(v)
        r = out[p]
        assert r.n_edges == len(sur)
        if sur:
            assert r.n_components == len(comps)
            assert r.largest == max(len(v) for v in comps.values())
            assert r.n_vertices == sum(len(v) for v in comps.values())
        else:
            assert (r.n_vertices, r.n_components, r.largest) == (0, 0, 0)


def test_selfjoin_size_audit_hand_counts(spark, tmp_path):
    # l_orderkey counts [3,1]: exact 3^2+1 = 10, est 16/2 = 8 -> 1.25
    d = datetime.datetime(2024, 1, 1)
    rows = [(1, 7, 100, i, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
            for i in range(3)]
    rows.append((2, 8, 100, 0, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import __spark_entry__ as entrymod

    out = {r.key_col: r for r in entrymod.q_selfjoin_size_audit(
        spark, str(tmp_path)).collect()}
    ok = out["l_orderkey"]
    assert (ok.n_rows, ok.n_keys, ok.exact_join_size) == (4, 2, 10)
    assert ok.independence_estimate == 8.0
    assert ok.skew_ratio == 1.25
    # suppkey: one key holding all 4 rows -> exact 16, est 16, ratio 1
    sk = out["l_suppkey"]
    assert (sk.exact_join_size, sk.skew_ratio) == (16, 1.0)
