"""LLM hallucination / uncertainty scoring (reference llm_uncertainty)."""

from runia_core_tpu.llm.attention import (
    StreamingAttentionAggregator,
    _get_attention_rollout,
    _get_average_attention_all,
    _get_recurent_attention,
    _reconstruct_attention_matrix,
)
from runia_core_tpu.llm.continuous import (
    ContinuousBatchingEngine,
    speculative_breakeven,
)
from runia_core_tpu.llm.serve_uncertainty import (
    UncertaintyServer,
    serve_uncertainties,
)
from runia_core_tpu.llm.generate import JaxGenerator, run_generation, sample_logits
from runia_core_tpu.llm.service import GenerationService
from runia_core_tpu.llm.speculative import SpeculativeGenerator
from runia_core_tpu.llm.scores import (
    RAUQ,
    batched_rauq,
    compute_uncertainties,
    eigen_score,
    generation_entropy,
    normalized_entropy,
    perplexity,
    rauq_uncertainty,
    rauq_uncertainty_mean_heads,
    rauq_uncertainty_rollout,
    semantic_entropy,
)
from runia_core_tpu.llm.utils import (
    _are_equivalent,
    _pairwise_equivalence_matrix,
    _semantic_clustering,
    _semantic_clustering_batched,
    make_nli_batch_labels,
    make_nli_equivalence,
)

__all__ = [
    "eigen_score",
    "normalized_entropy",
    "semantic_entropy",
    "perplexity",
    "generation_entropy",
    "rauq_uncertainty",
    "rauq_uncertainty_mean_heads",
    "rauq_uncertainty_rollout",
    "RAUQ",
    "batched_rauq",
    "compute_uncertainties",
    "JaxGenerator",
    "SpeculativeGenerator",
    "GenerationService",
    "ContinuousBatchingEngine",
    "speculative_breakeven",
    "serve_uncertainties",
    "UncertaintyServer",
    "run_generation",
    "sample_logits",
    "StreamingAttentionAggregator",
    "make_nli_equivalence",
    "make_nli_batch_labels",
]
