from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# importing the modules populates the registry
from . import rollups, queries, tpch, similarity, dedup, text, multimodal  # noqa: F401,E402
