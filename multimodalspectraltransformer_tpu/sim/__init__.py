from . import (  # noqa: F401
    distill,
    factory,
    gnn,
    graphs,
    ir_rules,
    reconstruct,
    shift_rules,
    stereo,
)
