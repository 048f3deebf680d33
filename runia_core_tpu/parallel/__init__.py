"""Device-mesh parallelism: sharded scoring, fitting, and training helpers."""

from runia_core_tpu.parallel.fsdp import (
    fsdp_shard_params,
    fsdp_spec,
    fsdp_train_step,
)
from runia_core_tpu.parallel.llama_tp import llama_tp_specs, shard_llama_params
from runia_core_tpu.parallel.mesh import (
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
    sharded_train_step,
)
from runia_core_tpu.parallel.moe import (
    MoEParams,
    init_moe,
    moe_ffn,
    sharded_moe_ffn,
)
from runia_core_tpu.parallel.pipeline import pipeline_apply
from runia_core_tpu.parallel.ring_attention import (
    ring_attention,
    ring_self_attention,
)
from runia_core_tpu.parallel.sharded import (
    data_parallel_scorer,
    fit_md_sharded,
    sharded_kde_log_density,
    sharded_knn_score,
    sharded_mean_and_covariance,
)

__all__ = [
    "data_parallel_scorer",
    "fit_md_sharded",
    "sharded_kde_log_density",
    "sharded_knn_score",
    "sharded_mean_and_covariance",
    "fsdp_shard_params",
    "fsdp_spec",
    "fsdp_train_step",
    "initialize_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "sharded_train_step",
    "ring_attention",
    "ring_self_attention",
    "MoEParams",
    "init_moe",
    "moe_ffn",
    "sharded_moe_ffn",
    "pipeline_apply",
    "llama_tp_specs",
    "shard_llama_params",
]
