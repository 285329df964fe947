"""graphdb_testing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the ``robmccoll/graphdb-testing``
benchmark suite (reference surveyed in ``SURVEY.md``): an undirected,
weighted, dynamic property graph with

* bulk load / batch update (insert = upsert+increment, delete =
  complement-encoded pairs),
* the four benchmark kernels — connected components, BFS/SSSP,
  PageRank, edge-update throughput,
* the STINGER analytics pack (triangles / clustering coefficients,
  k-core, approximate betweenness, community agglomeration,
  histograms),
* binary CSR ``.g`` / actions ``.a`` file formats and an RMAT
  generator,
* a micro-batch streaming workflow,

plus large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal column plumbing).

Everything is built on the public PySpark DataFrame/SQL API — logical
plans are declared declaratively and Catalyst/Tungsten pick the
physical strategy.  Driver-side fixpoint loops (the reference's
convergence loops, e.g. ``tests/sqlite/test.c:157-187``) are the only
imperative control structure.
"""

__version__ = "0.1.0"
