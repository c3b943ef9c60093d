"""Pallas TPU kernels for the framework's hot ops (SURVEY.md §7 design
decision 5). Kernels auto-fall back to interpret mode off-TPU."""

from .auction import (  # noqa: F401
    assignment_cost,
    auction_assignment_cost_pallas,
    batched_assignment_error_pallas,
)
