"""bigdata_old_spark — a PySpark-native RDF/SPARQL analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system (a Java RDF store with a native
SPARQL 1.1 engine, RDFS inference, full-text search, and GAS graph
analytics) on top of the Spark DataFrame/SQL stack.

Design (see SURVEY.md):
  * RDF statements live in ONE Parquet-backed DataFrame with the object
    term stored *inline* as typed columns (no lexicon round-trip —
    the reference's ChunkedMaterializationOp becomes a no-op).
  * SPARQL is parsed by a pure-Python recursive-descent parser into a
    small algebra (``algebra.py``) and compiled into DataFrame
    compositions (``compiler.py``) so Catalyst/AQE do the physical
    planning (join strategy, pushdown, skew).
  * Iterative constructs (property paths, RDFS closure, graph
    analytics) are driver-side fixpoint loops over DataFrames.
"""

from bigdata_old_spark.changesets import ChangeLog, ChangeSet, InMemChangeLog
from bigdata_old_spark.client import RemoteRepository, RemoteRepositoryManager
from bigdata_old_spark.describe_cache import DescribeCache
from bigdata_old_spark.gom import ObjectManager, RemoteObjectManager
from bigdata_old_spark.session import get_spark
from bigdata_old_spark.store import TripleStore

__all__ = [
    "get_spark", "TripleStore", "ChangeLog", "ChangeSet", "InMemChangeLog",
    "DescribeCache", "ObjectManager", "RemoteObjectManager",
    "RemoteRepository", "RemoteRepositoryManager",
]
__version__ = "0.1.0"
