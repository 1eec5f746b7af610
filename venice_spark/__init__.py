"""venice_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of linkedin/venice (derived-data KV platform).

Architecture (Spark-first, not a port):
  - A *store* is a named dataset with a key schema and versioned value data.
    Each batch push writes an immutable parquet *version* directory; the
    catalog atomically flips a "current version" pointer
    (reference: internal/venice-common/.../meta/Store.java, Version.java).
  - The read path (get / batchGet / read-compute / facet aggregation) lowers
    to DataFrame column expressions so Catalyst does pruning + pushdown
    (reference: clients/venice-thin-client/.../ComputeRequestBuilder.java).
  - The write path (partial updates, timestamp conflict resolution, hybrid
    batch+realtime merge, CDC) is implemented with window functions,
    an update-expression library, and Structured Streaming
    (reference: clients/da-vinci-client/.../replication/merge/).
  - Beyond the reference surface: large-scale training-data operators
    (dedup, similarity search, text analysis, multimodal plumbing).
"""

from venice_spark.session import get_spark
from venice_spark.catalog import StoreCatalog
from venice_spark.engine import VeniceSparkEngine

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "StoreCatalog",
    "VeniceSparkEngine",
    "__version__",
    # heavier surfaces live in submodules (imported lazily by users):
    #   venice_spark.compute      read-compute DSL
    #   venice_spark.updates      write-compute partial updates
    #   venice_spark.producer     put/delete/update producer
    #   venice_spark.merge.dcr    active-active conflict resolution
    #   venice_spark.streaming    hybrid replay / CDC / stateful operators
    #   venice_spark.dedup        dedup + sequence packing
    #   venice_spark.similarity   ANN (brute force / LSH / IVF)
    #   venice_spark.pipeline     corpus-prep composition
    #   venice_spark.multimodal   binary media columns (real PPM/WAV codecs)
    #   venice_spark.validation   declarative pre-push data-quality gate
]
