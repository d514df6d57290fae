"""LinkGraph — the engine's user-facing facade.

A plato user launches one binary per algorithm over a CSV edge list
(/root/reference/example/*.cc + scripts/run_*.sh); the equivalent here is
one object that owns the edge table (canonical undirected or directed), the
vid dictionary, and cached derived state, with one method per algorithm:

    g = LinkGraph.from_corpus(spark, corpus)          # or .from_edges(...)
    g.pagerank(eps=1e-6)                              # (id|vkey, rank)
    g.connected_components(); g.label_propagation()
    g.triangle_count(); g.kcore(); g.louvain(); ...

Every method returns a DataFrame keyed by the dense vertex id, or by the
original vertex key when ``decode=True`` (dictionary join — plato's
vid_encoder_t::decode, /root/reference/plato/graph/structure/vid_encoder.hpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plato_spark.algos.betweenness import betweenness_sampled
from plato_spark.algos.bfs import bfs, tree_stat
from plato_spark.algos.closeness import closeness_sampled
from plato_spark.algos.hanp import hanp
from plato_spark.algos.hyperanf import hyperanf
from plato_spark.algos.infomap import infomap
from plato_spark.algos.kcore import kcore
from plato_spark.algos.louvain import louvain, modularity
from plato_spark.algos.lpa import label_propagation
from plato_spark.algos.nstep import nstep_degrees
from plato_spark.algos.pagerank import pagerank, personalized_pagerank
from plato_spark.algos.nstep import nstep_reach_exact
from plato_spark.algos.sssp import sssp
from plato_spark.algos.triangles import (
    clustering_coefficient,
    common_neighbors,
    triangle_count,
)
from plato_spark.algos.walks import metapath_walks, random_walks
from plato_spark.algos.wcc import connected_components
from plato_spark.corpus.extract import extract_graph
from plato_spark.engine.checkpoint import CheckpointManager
from plato_spark.graph.edges import (
    canonicalize_undirected,
    encode_vertices,
    graph_stats,
    symmetrize,
)


class LinkGraph:
    """Owns (canonical undirected edge table, dictionary, cached sym view)."""

    def __init__(self, edges: DataFrame, dictionary: DataFrame | None = None,
                 weight: str | None = None):
        self.edges = edges.persist()
        self.dictionary = dictionary.persist() if dictionary is not None else None
        self.weight = weight
        self._sym = None
        self._stats = None

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_corpus(cls, spark: SparkSession, corpus: DataFrame,
                    impl: str = "arrow") -> "LinkGraph":
        """corpus (repo,path,commit,lang,content) -> encoded canonical graph."""
        edges_str, _ = extract_graph(corpus, impl=impl)
        edges_str = edges_str.persist()
        enc, dictionary = encode_vertices(edges_str)
        canon = (
            enc.groupBy(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .agg(F.sum("weight").alias("weight"))
            .where("src != dst")
        )
        return cls(canon, dictionary, weight="weight")

    @classmethod
    def from_edges(cls, edges: DataFrame, directed: bool = False,
                   weight: str | None = None) -> "LinkGraph":
        """Raw (src,dst[,weight]) with any orderable key type; encodes when
        keys are not already integral."""
        dtypes = dict(edges.dtypes)
        dictionary = None
        if dtypes["src"] not in ("bigint", "int", "long"):
            edges, dictionary = encode_vertices(edges)
        if not directed:
            edges = canonicalize_undirected(edges) if weight is None else (
                edges.groupBy(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                ).agg(F.sum(weight).alias(weight)).where("src != dst")
            )
        return cls(edges, dictionary, weight=weight)

    # -- views -------------------------------------------------------------
    @property
    def sym(self) -> DataFrame:
        if self._sym is None:
            self._sym = symmetrize(self.edges).persist()
        return self._sym

    def stats(self) -> dict:
        if self._stats is None:
            self._stats = graph_stats(self.edges)
        return self._stats

    def decode(self, df: DataFrame, id_cols: tuple[str, ...] = ("id",)) -> DataFrame:
        if self.dictionary is None:
            return df
        out = df
        for c in id_cols:
            out = out.join(
                self.dictionary.select(F.col("id").alias(c), F.col("vkey").alias(f"{c}_key")),
                c,
            )
        return out

    def _maybe_decode(self, df: DataFrame, decode: bool, id_cols=("id",)) -> DataFrame:
        return self.decode(df, id_cols) if decode else df

    # -- algorithms ----------------------------------------------------------
    def pagerank(self, decode: bool = False, ckpt_dir: str | None = None, **kw) -> DataFrame:
        ckpt = CheckpointManager(ckpt_dir, "pagerank") if ckpt_dir else None
        if self.weight and "weight" not in kw:
            kw["weight"] = self.weight
        return self._maybe_decode(pagerank(self.sym, ckpt=ckpt, **kw), decode)

    def personalized_pagerank(self, sources: list[int], decode: bool = False,
                              **kw) -> DataFrame:
        if self.weight and "weight" not in kw:
            kw["weight"] = self.weight
        return self._maybe_decode(
            personalized_pagerank(self.sym, sources, **kw), decode)

    def connected_components(self, decode: bool = False, **kw) -> DataFrame:
        return self._maybe_decode(
            connected_components(self.edges.select("src", "dst"), **kw), decode
        )

    def label_propagation(self, decode: bool = False, **kw) -> DataFrame:
        return self._maybe_decode(label_propagation(self.sym, **kw), decode)

    def hanp(self, decode: bool = False, **kw) -> DataFrame:
        if self.weight and "weight" not in kw:
            kw["weight"] = self.weight
        return self._maybe_decode(hanp(self.sym, **kw), decode)

    def triangle_count(self, per_vertex: bool = False) -> DataFrame:
        return triangle_count(self.edges.select("src", "dst"), per_vertex=per_vertex)

    def clustering_coefficient(self, decode: bool = False) -> DataFrame:
        return self._maybe_decode(clustering_coefficient(self.edges), decode)

    def nstep_reach_exact(self, **kw) -> DataFrame:
        return nstep_reach_exact(self.sym, **kw)

    def common_neighbors(self, **kw) -> DataFrame:
        return common_neighbors(self.edges.select("src", "dst"), **kw)

    def sssp(self, root: int, decode: bool = False, **kw) -> DataFrame:
        if self.weight and "weight" not in kw:
            kw["weight"] = self.weight
        return self._maybe_decode(sssp(self.sym, root=root, **kw), decode)

    def bfs(self, root: int, **kw) -> DataFrame:
        return bfs(self.sym.select("src", "dst"), root=root, **kw)

    def tree_stat(self, root: int) -> DataFrame:
        return tree_stat(self.sym.select("src", "dst"), root=root)

    def kcore(self, **kw) -> DataFrame:
        return kcore(self.edges.select("src", "dst"), **kw)

    def hyperanf(self, **kw) -> tuple[float, list[float]]:
        return hyperanf(self.sym.select("src", "dst"), **kw)

    def nstep_degrees(self, **kw) -> DataFrame:
        return nstep_degrees(self.sym.select("src", "dst"), **kw)

    def closeness(self, **kw) -> DataFrame:
        return closeness_sampled(self.edges.select("src", "dst"), **kw)

    def betweenness(self, **kw) -> DataFrame:
        return betweenness_sampled(self.edges.select("src", "dst"), **kw)

    def louvain(self, **kw) -> DataFrame:
        if self.weight and "weight" not in kw:
            kw["weight"] = self.weight
        return louvain(self.edges, **kw)

    def modularity(self, communities: DataFrame) -> float:
        return modularity(self.edges.select("src", "dst"), communities)

    def infomap(self, **kw) -> DataFrame:
        if self.weight and "weight" not in kw:
            kw["weight"] = self.weight
        return infomap(self.edges, **kw)

    def random_walks(self, **kw) -> DataFrame:
        return random_walks(self.sym.select("src", "dst"), **kw)

    def metapath_walks(self, metapath: list[str], **kw) -> DataFrame:
        return metapath_walks(self.edges, metapath, **kw)

    def hits(self, decode: bool = False, **kw) -> DataFrame:
        from plato_spark.algos.hits import hits

        return self._maybe_decode(
            hits(self.edges.select("src", "dst"), **kw), decode, ("id",)
        )

    def component_edges(self, target: int | None = None, **kw) -> DataFrame:
        from plato_spark.algos.wcc import component_edges

        e = self.edges.select("src", "dst")
        return component_edges(e, connected_components(e, **kw), target=target)

    def neighbor_sample(self, k: int = 5, **kw) -> DataFrame:
        from plato_spark.algos.neighbor_sample import neighbor_sample

        return neighbor_sample(self.edges.select("src", "dst"), k=k, **kw)

    def maximal_independent_set(self, **kw) -> DataFrame:
        from plato_spark.algos.mis import maximal_independent_set

        return maximal_independent_set(self.sym.select("src", "dst"), **kw)

    def maximal_matching(self, **kw) -> DataFrame:
        from plato_spark.algos.matching import maximal_matching

        return maximal_matching(self.edges.select("src", "dst"), **kw)

    def minimum_spanning_forest(self, **kw) -> DataFrame:
        from plato_spark.algos.msf import boruvka_msf

        cols = self.edges.columns
        e = (self.edges if "weight" in cols
             else self.edges.select("src", "dst", F.lit(1.0).alias("weight")))
        return boruvka_msf(e.select("src", "dst", "weight"), **kw)

    def coloring(self, **kw) -> DataFrame:
        from plato_spark.algos.coloring import jones_plassmann_coloring

        return jones_plassmann_coloring(self.sym.select("src", "dst"), **kw)

    def knn_sparsify(self, k: int = 10) -> DataFrame:
        from plato_spark.functions.recommend import knn_graph

        cols = self.edges.columns
        e = (self.edges if "weight" in cols
             else self.edges.select("src", "dst", F.lit(1.0).alias("weight")))
        return knn_graph(e.select("src", "dst", "weight"), k=k)
