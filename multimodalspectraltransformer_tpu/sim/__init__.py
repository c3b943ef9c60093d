from . import factory, gnn, graphs, reconstruct, shift_rules, stereo  # noqa: F401
