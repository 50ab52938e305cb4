"""robosystems_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of RoboFinSystems/robosystems (financial knowledge-graph
platform) as an idiomatic PySpark engine:

- typed node/relationship schema registry  -> ``robosystems_spark.schema``
- staging + materialization (files->tables) -> ``robosystems_spark.sources``
- relational/graph-pattern operators        -> ``robosystems_spark.operators``
- analytics views (trial balance, facts)    -> ``robosystems_spark.views``
- query gating / analysis / serving         -> ``robosystems_spark.queryapi``, ``.serving``
- structured-streaming extensions           -> ``robosystems_spark.streaming``
- LLM-data-pipeline operators (dedup, ANN,
  text analysis, multimodal)                -> ``robosystems_spark.operators``

Everything is DataFrame-first: logical plans are declared with the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
"""

__version__ = "0.1.0"

from robosystems_spark._hostmem import harden_host_memory

# Guard against the sandbox host's pathological THP fault path before
# any operator allocates a large numpy buffer (see _hostmem docstring).
# Probe-based: a healthy host pays ~5 ms once per process, no changes.
harden_host_memory()

from robosystems_spark.session import get_spark  # noqa: F401
from robosystems_spark.cypher import CypherEngine  # noqa: F401
from robosystems_spark.sources.materialize import GraphStore  # noqa: F401
from robosystems_spark.queryapi.cypher_gate import CypherGate  # noqa: F401
from robosystems_spark.queryapi.sql_gate import SQLGate  # noqa: F401
from robosystems_spark.serving.service import QueryService  # noqa: F401
