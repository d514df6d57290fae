"""Full Holland-Leinhardt triad census over a directed graph.

Counts all C(n,3) vertex triples into the 16 directed-triad
isomorphism classes (Holland & Leinhardt 1970; Wasserman-Faust ch. 14)
— the complete directed-structure fingerprint that the dyad census
(algos/dyads) is the 2-vertex prefix of.  Transitivity pressure
(030T vs 030C), hierarchy (021D/U chains), and reciprocity clustering
(201/210/300) all read directly off this table.

Class labels: MAN code (mutual-asym-null dyad counts) plus an
orientation suffix where MAN is ambiguous.  Suffix convention used on
BOTH engines (documented because packages disagree on letter naming):
the distinguished vertex — the asym-degree-2 vertex for 021/030, the
non-mutual-pair vertex for 111/120 — gets **D** when it SENDS (asym
out-degree = arity), **U** when it RECEIVES, **C** for the mixed/chain/
cycle case.  This matches 021D = A<-B->C, 111D = A<->B<-C,
030C = the 3-cycle.

Distributed strategy (the oracle brute-forces all triples in SQL; this
side never materializes the O(n^3) space):

1. triples with >= 2 support edges — enumerate wedges over the
   undirected support adjacency (center join, arms ordered), attach the
   three pairs' direction bits from the dyad table, classify with pure
   column arithmetic on isomorphism invariants (no sorting needed);
   triangles appear once per center, deduped by keeping center = min.
2. triples with exactly 1 support edge — counted analytically per dyad:
   (n-2) - |N(u) U N(v) \\ {u,v}| third vertices, with the common-
   neighbor term read off the deduped triangle rows (class 102 for a
   mutual dyad, 012 for asym).
3. 003 = C(n,3) minus everything else, in-plan via a 1-row total.

Scale: the wedge join is the census's inherent sum-of-deg^2 cost (the
same shape as triangle counting before degree orientation; on
hub-skewed graphs pre-split hubs with graph/salting before calling).
Everything downstream of enumeration is exact BIGINT column math and a
16-row output.  One driver scalar: the vertex count for C(n,3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIAD_CLASSES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _classify(df: DataFrame) -> DataFrame:
    """Adds ``triad`` from the six direction bits of pairs
    P1=(c,u), P2=(c,w), P3=(u,w): f_i = first->second, r_i = reverse."""
    m1 = F.col("f1") * F.col("r1")
    m2 = F.col("f2") * F.col("r2")
    m3 = F.col("f3") * F.col("r3")
    m = m1 + m2 + m3
    a = (
        (F.col("f1") + F.col("r1") - 2 * m1)
        + (F.col("f2") + F.col("r2") - 2 * m2)
        + (F.col("f3") + F.col("r3") - 2 * m3)
    )
    # per-vertex asym in/out degrees inside the triple
    out_c = (F.col("f1") - m1) + (F.col("f2") - m2)
    in_c = (F.col("r1") - m1) + (F.col("r2") - m2)
    out_u = (F.col("r1") - m1) + (F.col("f3") - m3)
    in_u = (F.col("f1") - m1) + (F.col("r3") - m3)
    out_w = (F.col("r2") - m2) + (F.col("r3") - m3)
    in_w = (F.col("f2") - m2) + (F.col("f3") - m3)
    # distinguished vertex for m=1: the one outside the mutual pair
    t_out = F.when(m1 == 1, out_w).when(m2 == 1, out_u).otherwise(out_c)
    t_in = F.when(m1 == 1, in_w).when(m2 == 1, in_u).otherwise(in_c)
    cls = (
        F.when((m == 0) & (a == 0), "003")
        .when((m == 0) & (a == 1), "012")
        .when((m == 1) & (a == 0), "102")
        .when(
            (m == 0) & (a == 2),
            F.when(F.greatest(out_c, out_u, out_w) == 2, "021D")
            .when(F.greatest(in_c, in_u, in_w) == 2, "021U")
            .otherwise("021C"),
        )
        .when((m == 1) & (a == 1), F.when(t_out == 1, "111D").otherwise("111U"))
        .when(
            (m == 0) & (a == 3),
            F.when(
                (out_c == 1) & (in_c == 1) & (out_u == 1) & (in_u == 1)
                & (out_w == 1) & (in_w == 1),
                "030C",
            ).otherwise("030T"),
        )
        .when(
            (m == 1) & (a == 2),
            F.when(t_out == 2, "120D").when(t_in == 2, "120U").otherwise("120C"),
        )
        .when((m == 2) & (a == 0), "201")
        .when((m == 2) & (a == 1), "210")
        .otherwise("300")
    )
    return df.withColumn("triad", cls)


def triad_census(edges: DataFrame, verts: DataFrame) -> DataFrame:
    """(triad, n) — exactly 16 zero-filled rows over the full triple
    space of ``verts`` (isolated vertices count toward 003/012/102
    thirds, the dyad-census universe convention).  ``edges``:
    (src, dst) directed; self-loops and duplicates ignored."""
    spark = edges.sparkSession
    universe = verts.select("id").distinct()
    n = universe.count()
    c3 = n * (n - 1) * (n - 2) // 6

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    dy = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("f"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("r"),
        )
        .groupBy("a", "b")
        .agg(F.max("f").cast("int").alias("f"), F.max("r").cast("int").alias("r"))
        .persist()
    )
    dy.count()

    adj = dy.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        dy.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    # wedges centered at c with ordered arms u < w
    wedges = (
        adj.select(F.col("x").alias("c"), F.col("y").alias("u"))
        .join(adj.select(F.col("x").alias("c"), F.col("y").alias("w")), "c")
        .where(F.col("u") < F.col("w"))
    )

    def pair_bits(df, left, right, idx):
        """Join dyad bits for (left, right), oriented left->right."""
        lo = F.least(F.col(left), F.col(right))
        hi = F.greatest(F.col(left), F.col(right))
        d = dy.select(
            F.col("a").alias(f"_a{idx}"), F.col("b").alias(f"_b{idx}"),
            F.col("f").alias(f"_f{idx}"), F.col("r").alias(f"_r{idx}"),
        )
        j = df.join(
            d,
            (lo == F.col(f"_a{idx}")) & (hi == F.col(f"_b{idx}")),
            "left",
        )
        fwd = F.when(
            F.col(left) < F.col(right), F.coalesce(F.col(f"_f{idx}"), F.lit(0))
        ).otherwise(F.coalesce(F.col(f"_r{idx}"), F.lit(0)))
        rev = F.when(
            F.col(left) < F.col(right), F.coalesce(F.col(f"_r{idx}"), F.lit(0))
        ).otherwise(F.coalesce(F.col(f"_f{idx}"), F.lit(0)))
        return (
            j.withColumn(f"f{idx}", fwd)
            .withColumn(f"r{idx}", rev)
            .drop(f"_a{idx}", f"_b{idx}", f"_f{idx}", f"_r{idx}")
        )

    trip = pair_bits(wedges, "c", "u", 1)
    trip = pair_bits(trip, "c", "w", 2)
    trip = pair_bits(trip, "u", "w", 3)
    closed = F.col("f3") + F.col("r3") > 0
    # a triangle yields one wedge per center; keep center = min vertex
    trip = trip.where(~closed | (F.col("c") < F.col("u")))

    classified = _classify(trip)
    multi_counts = classified.groupBy("triad").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )

    # ---- exactly-one-support-edge triples, analytically per dyad ----
    deg = adj.groupBy(F.col("x").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    tri_pairs = (
        classified.where(closed)
        .select(
            F.array(
                F.array(F.least("c", "u"), F.greatest("c", "u")),
                F.array(F.least("c", "w"), F.greatest("c", "w")),
                F.array(F.least("u", "w"), F.greatest("u", "w")),
            ).alias("ps")
        )
        .select(F.explode("ps").alias("p"))
        .select(F.col("p")[0].alias("a"), F.col("p")[1].alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    singles = (
        dy.join(tri_pairs, ["a", "b"], "left")
        .join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(F.col("f") * F.col("r") == 1, "102").otherwise("012").alias("triad"),
            (
                F.lit(n - 2)
                - (F.col("da") - 1)
                - (F.col("db") - 1)
                + F.coalesce(F.col("cn"), F.lit(0))
            ).cast("long").alias("n"),
        )
        .groupBy("triad")
        .agg(F.sum("n").cast("long").alias("n"))
    )

    nonnull = (
        multi_counts.unionByName(singles)
        .groupBy("triad")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    total = nonnull.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("tot"))
    base = spark.createDataFrame([(t,) for t in TRIAD_CLASSES], "triad string")
    out = (
        base.join(nonnull, "triad", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "triad",
            F.when(F.col("triad") == "003", F.lit(c3) - F.col("tot"))
            .otherwise(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("n"),
        )
    )
    dy.unpersist()
    return out
