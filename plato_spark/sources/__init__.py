from plato_spark.sources.tables import load_table, part_cooccurrence_edges  # noqa: F401
