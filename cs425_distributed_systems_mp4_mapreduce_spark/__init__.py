"""PySpark-native analytics engine with the query/data-processing
capabilities of the CS425 MP4 "MapleJuice" MapReduce reference
(jessiepyx/cs425_distributed_systems_mp4_MapReduce — see SURVEY.md §0:
the checkout at /root/reference was empty; semantics reconstructed from
the public assignment spec), re-expressed Spark-first:

- ``sources``   — parquet table loading with the verified schema set
                  (FIXTURES.md), including the events nanos-timestamp fix.
- ``operators`` — maple/juice parity layer (arbitrary user map/reduce
                  functions, hash/range partitioners), dedup, similarity,
                  multimodal plumbing.
- ``functions`` — parity-safe aggregation helpers (exact decimal sums),
                  vector math, text analysis primitives.
- ``plans``     — the reference's SQL mini-frontend (SELECT ALL FROM x
                  WHERE <regex> / 2-dataset equi-join) compiled to
                  DataFrame plans.
- ``streaming`` — Structured Streaming twins of the batch window queries.
- ``queries``   — the declared query registry (SURVEY.md §2.2) with
                  DuckDB oracle SQL for the driver's t2 gate.

Everything here is public-API PySpark 4.x; no custom Catalyst rules.
Design posture is 100 TB scale: declarative DataFrame plans (Catalyst
pushdown/pruning/join selection), broadcast for bounded dims, AQE on,
no driver-side collect() inside operators.
"""

__version__ = "0.1.0"
