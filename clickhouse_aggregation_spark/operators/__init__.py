from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# importing the modules populates the registry
from . import rollups, queries, tpch  # noqa: F401,E402
