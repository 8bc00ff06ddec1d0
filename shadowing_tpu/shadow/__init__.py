"""The shadow search: engine, embeddings, distances, contexts."""
from shadowing_tpu.shadow.context import (
    ContextManager,
    CrossChannelContext,
    ImputationContext,
    PredictionContext,
)
from shadowing_tpu.shadow.distance import (
    MSE,
    CosineDistance,
    PathDistance,
    RelativeMSE,
)
from shadowing_tpu.shadow.embedding import Foveal, Identity, PathEmbedding
from shadowing_tpu.shadow.engine import PathShadowing
