"""map_reduce_go_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference MapReduce
engine (Balthazark/map-reduce-go, see SURVEY.md) at Spark altitude:

- the reference's fixed Map -> Shuffle -> Reduce dataflow becomes declarative
  DataFrame plans optimized by Catalyst (SURVEY.md section 2.1);
- the 7 canned MapReduce applications (wc, indexer, timing probes, jobcount,
  early_exit, crash/nocrash — reference src/mrapps/*) become native DataFrame
  queries registered in :mod:`map_reduce_go_spark.registry`;
- the generic 2-hook user API (Map/Reduce plugins, reference
  src/mr/worker.go:38) becomes :func:`map_reduce_go_spark.operators.mapreduce.map_reduce`;
- large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) extend the surface for the 100 TB
  design target.

Everything here is DataFrame-first: logical plans are declared with the
pyspark.sql API and Catalyst/Tungsten pick the physical strategy. Python
UDFs appear only where built-ins genuinely cannot express the semantics
(the generic map_reduce hooks, multimodal decode stubs).
"""

from map_reduce_go_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
