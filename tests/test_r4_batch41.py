"""Round-4 batch 41: SCAN structural clustering (Xu et al. KDD'07)."""

from plato_spark.algos.scan import scan_clusters


def _roles(spark, edges, **kw):
    canon = spark.createDataFrame(edges, "src long, dst long")
    return {r.id: (r.role, r.cluster)
            for r in scan_clusters(canon, **kw).collect()}


def test_scan_two_triangles_hub_and_outlier(spark):
    # triangles {1,2,3} and {4,5,6}; 7 bridges both (hub); 8 hangs off 2
    # (outlier at eps=3/4: sigma(8,2) = 2/sqrt(2*4) ~ 0.707 < 0.75)
    out = _roles(
        spark,
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (1, 7), (4, 7),
         (2, 8)],
        eps_num=3, eps_den=4, mu=3)
    assert out[1] == ("core", 1)
    assert out[2] == ("core", 1)
    assert out[3] == ("core", 1)
    assert out[4] == ("core", 4)
    assert out[5] == ("core", 4)
    assert out[6] == ("core", 4)
    assert out[7] == ("hub", None)      # neighbors in 2 clusters
    assert out[8] == ("outlier", None)  # 1 neighbor, 1 cluster


def test_scan_border_attachment(spark):
    # triangle {1,2,3} + vertex 4 on edges (1,4),(2,4); at mu=4 only
    # 1 and 2 have 4 eps-neighbors (incl. self) -> cores; 3 and 4 are
    # eps-adjacent to a core -> borders of cluster 1
    out = _roles(
        spark,
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)],
        eps_num=3, eps_den=4, mu=4)
    assert out[1] == ("core", 1)
    assert out[2] == ("core", 1)
    assert out[3] == ("border", 1)
    assert out[4] == ("border", 1)


def test_scan_exact_epsilon_boundary(spark):
    # pendant (2,8) off triangle {1,2,3}: sigma = 2/sqrt(2*4) =
    # 0.70710...; eps = 7/10 ADMITS it (>=), so 8 becomes a border of
    # the triangle cluster — pins the >= (not >) comparison and the
    # exact integer form (cn+2)^2*den^2 >= num^2*(du+1)(dv+1):
    # 4*100 >= 49*8 = 392.
    out = _roles(
        spark,
        [(1, 2), (1, 3), (2, 3), (2, 8)],
        eps_num=7, eps_den=10, mu=3)
    assert out[8] == ("border", 1)
    # ... and eps = 71/100 rejects it: 4*10000 = 40000 < 41*41*... no:
    # 71^2*8 = 40328 > 40000 -> 8 drops to outlier
    out2 = _roles(
        spark,
        [(1, 2), (1, 3), (2, 3), (2, 8)],
        eps_num=71, eps_den=100, mu=3)
    assert out2[8] == ("outlier", None)


def test_scan_singleton_core_cluster(spark):
    # two disjoint triangles, no bridge: each is its own cluster with
    # min-id labels; all vertices core
    out = _roles(
        spark,
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)],
        eps_num=3, eps_den=5, mu=3)
    assert {out[i] for i in (1, 2, 3)} == {("core", 1)}
    assert {out[i] for i in (10, 11, 12)} == {("core", 10)}
