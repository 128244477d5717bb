"""Data-parallel batch analysis over a jax.sharding.Mesh."""

from .runner import BatchResult, MeshRunner, analyze_library

__all__ = ["BatchResult", "MeshRunner", "analyze_library"]
