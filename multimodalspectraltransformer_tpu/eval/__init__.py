from . import generation, harness  # noqa: F401
from .harness import EvalSummary, MoleculeResult, evaluate_molecules, top_k_accuracy  # noqa: F401
