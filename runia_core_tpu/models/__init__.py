"""Model zoo: flax modules with built-in feature taps."""

from runia_core_tpu.models.detection import JaxDetectorAdapter, SimpleDetector
from runia_core_tpu.models.detr import DETR, DetrJaxAdapter, convert_hf_detr
from runia_core_tpu.models.deeplab import ASPP, DeepLabV3Plus
from runia_core_tpu.models.segmentation import SimpleSegmenter
from runia_core_tpu.models.resnet import (
    ResNet,
    ResNet18,
    ResNet34,
    ResNet50,
    SimpleConvNet,
    build_tapped_forward,
    space_to_depth_2x2,
    stem_to_s2d,
)
from runia_core_tpu.models.llama import (
    LlamaLM,
    convert_hf_gemma,
    convert_hf_llama,
    convert_hf_mixtral,
    fuse_quantized_llama_params,
    quantize_llama_params,
)
from runia_core_tpu.models.quant_vision import (
    quantize_resnet,
    quantize_resnet_params,
)
from runia_core_tpu.models.deberta import (
    DebertaV2Classifier,
    convert_hf_deberta,
    wrap_jax_nli,
)
from runia_core_tpu.models.torch_convert import convert_hf_vit, convert_torch_resnet
from runia_core_tpu.models.neox import NeoXLM, convert_hf_gpt_neox
from runia_core_tpu.models.transformer import CausalLM, convert_hf_gpt2
from runia_core_tpu.models.vit import ViT
from runia_core_tpu.models.yolov8 import YoloV8, YoloV8JaxAdapter, convert_ultralytics_yolov8

__all__ = [
    "ViT",
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "SimpleConvNet",
    "build_tapped_forward",
    "SimpleDetector",
    "DETR",
    "DetrJaxAdapter",
    "convert_hf_detr",
    "JaxDetectorAdapter",
    "SimpleSegmenter",
    "DeepLabV3Plus",
    "ASPP",
    "CausalLM",
    "convert_hf_gpt2",
    "NeoXLM",
    "convert_hf_gpt_neox",
    "LlamaLM",
    "convert_hf_gemma",
    "convert_hf_llama",
    "convert_hf_mixtral",
    "fuse_quantized_llama_params",
    "quantize_llama_params",
    "convert_torch_resnet",
    "convert_hf_vit",
    "DebertaV2Classifier",
    "convert_hf_deberta",
    "wrap_jax_nli",
    "YoloV8",
    "YoloV8JaxAdapter",
    "convert_ultralytics_yolov8",
    "quantize_resnet",
    "quantize_resnet_params",
    "space_to_depth_2x2",
    "stem_to_s2d",
]
