from minivllm_tpu.models.registry import SUPPORTED_MODELS, TYPE_TO_ARCH, create_model

__all__ = ["SUPPORTED_MODELS", "TYPE_TO_ARCH", "create_model"]
