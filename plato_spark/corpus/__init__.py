from plato_spark.corpus.generator import synth_corpus, corpus_params  # noqa: F401
from plato_spark.corpus.extract import (  # noqa: F401
    co_commit_edges,
    path_link_edges,
    extract_graph,
    with_content_sha,
)
