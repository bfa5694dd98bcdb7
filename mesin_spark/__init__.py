"""mesin_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference SQL-engine POC ``4RSIM3R/poc-query-engine`` (Rust crate ``mesin``,
see /root/reference/Cargo.toml:2), re-expressed Spark-first:

- the reference's ``ExecutionContext::execute(sql)`` (reference
  src/context.rs:42-56) becomes :class:`mesin_spark.context.ExecutionContext`
  backed by ``spark.sql`` + Catalyst;
- its ``LogicalPlan`` IR (reference src/planner/logical_plan.rs:11-85) is a
  strict subset of Catalyst's logical operators, so we never build our own
  plan tree — we declare DataFrame plans and let Catalyst/Tungsten/AQE pick
  the physical strategy;
- its catalog (reference src/context.rs:17-34, name-only) becomes a typed
  Parquet-backed catalog (:mod:`mesin_spark.catalog`);
- the charter extension tier (LLM-data-pipeline operators: dedup, similarity
  search, text analysis, multimodal columns; streaming; window functions)
  lives under :mod:`mesin_spark.ext`.

Designed for a 1000-executor cluster at ~100 TB: no driver-side data loops,
broadcast hints for bounded dimensions, partial aggregation everywhere
(automatic), Arrow-vectorized Pandas UDFs only where built-ins can't express
the semantics.
"""

from mesin_spark.context import ExecutionContext
from mesin_spark.session import get_session

__all__ = ["ExecutionContext", "get_session"]
__version__ = "0.1.0"
