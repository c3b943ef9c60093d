from . import factory, gnn, graphs, reconstruct  # noqa: F401
