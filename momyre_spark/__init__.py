"""momyre_spark — a PySpark-native analytics & replication engine.

A from-scratch re-expression of the capabilities of the reference system
(LynxLine/momyre, a Go MongoDB->MySQL CDC replicator — see SURVEY.md) as an
idiomatic Spark library, extended with the query surface (joins, aggregations,
windows, set ops) and the LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) that a 100 TB training-data
pipeline needs.

Layout
------
- ``spec``       : declarative replication spec (YAML) -> schemas + projections
                   (reference: momyre.yml + run.go:82-125, mysql.go:54-56)
- ``sources``    : table loaders (parquet for tests; JDBC/Mongo gated), ops-log
                   source abstraction (reference: mongo.go readTable/readLogs)
- ``operators``  : CDC merge, orphan anti-join, dedup family, similarity
                   search, text analysis, multimodal plumbing
- ``sinks``      : JDBC upsert/delete with transactional batch-id checkpoint
                   (reference: mysql.go processOps/upsertRow/updateTimestampInTx)
- ``functions``  : scalar/vector/text column-expression helpers (JVM-side)
- ``plans``      : the declared query registry (SURVEY.md §2.10) + DuckDB oracles
- ``streaming``  : Structured Streaming CDC pipeline (foreachBatch apply)
"""

__version__ = "0.1.0"

from momyre_spark.engine import ReplicationEngine  # noqa: F401
from momyre_spark.session import apply_runtime_confs, get_spark  # noqa: F401
from momyre_spark.spec import Spec, TableSpec, parse_spec  # noqa: F401
