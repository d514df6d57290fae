from plato_spark.graph.edges import (  # noqa: F401
    canonicalize_undirected,
    encode_vertices,
    graph_stats,
    out_degrees,
    in_degrees,
    symmetrize,
)
from plato_spark.graph.csr import build_csr_blocks  # noqa: F401
from plato_spark.graph.partitioning import degree_weighted_ranges  # noqa: F401
