"""TPU ops: exact tournament top-k, sliding correlations, Pallas searches
(banded-Toeplitz :mod:`~shadowing_tpu.ops.pallas_search` and
context-factored :mod:`~shadowing_tpu.ops.pallas_factored`)."""
from shadowing_tpu.ops.sliding import sliding_dot
from shadowing_tpu.ops.topk import (
    TopKResult,
    merge_min,
    topk_min,
    topk_min_checked,
    topk_min_sort,
)
