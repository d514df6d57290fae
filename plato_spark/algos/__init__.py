from plato_spark.algos.pagerank import pagerank  # noqa: F401
from plato_spark.algos.wcc import connected_components  # noqa: F401
from plato_spark.algos.lpa import label_propagation  # noqa: F401
from plato_spark.algos.triangles import triangle_count, common_neighbors  # noqa: F401
from plato_spark.algos.bfs import bfs, tree_stat  # noqa: F401
from plato_spark.algos.kcore import kcore  # noqa: F401
from plato_spark.algos.hanp import hanp  # noqa: F401
from plato_spark.algos.hyperanf import hyperanf  # noqa: F401
from plato_spark.algos.closeness import closeness_sampled  # noqa: F401
from plato_spark.algos.louvain import louvain, modularity  # noqa: F401
from plato_spark.algos.betweenness import betweenness_sampled  # noqa: F401
from plato_spark.algos.nstep import nstep_degrees  # noqa: F401
from plato_spark.algos.walks import random_walks, metapath_walks  # noqa: F401
from plato_spark.algos.infomap import infomap  # noqa: F401
