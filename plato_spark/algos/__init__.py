from plato_spark.algos.pagerank import pagerank  # noqa: F401
from plato_spark.algos.wcc import connected_components  # noqa: F401
from plato_spark.algos.lpa import label_propagation  # noqa: F401
from plato_spark.algos.triangles import triangle_count, common_neighbors  # noqa: F401
