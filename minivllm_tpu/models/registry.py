"""Model registry (reference: /root/reference/minivllm/models/registry.py:15-52)."""

from __future__ import annotations

__all__ = ["SUPPORTED_MODELS", "TYPE_TO_ARCH", "create_model"]


def _qwen(hf_config, dtype, attn_backend):
    from minivllm_tpu.models.qwen import QwenForCausalLM

    return QwenForCausalLM(hf_config, dtype, attn_backend)


def _qwen_moe(hf_config, dtype, attn_backend):
    from minivllm_tpu.models.qwen_moe import QwenMoeForCausalLM

    return QwenMoeForCausalLM(hf_config, dtype, attn_backend)


def _mixtral(hf_config, dtype, attn_backend):
    from minivllm_tpu.models.mixtral import MixtralForCausalLM

    return MixtralForCausalLM(hf_config, dtype, attn_backend)


def _gemma(hf_config, dtype, attn_backend):
    from minivllm_tpu.models.gemma import GemmaForCausalLM

    return GemmaForCausalLM(hf_config, dtype, attn_backend)


def _gemma2(hf_config, dtype, attn_backend):
    from minivllm_tpu.models.gemma import Gemma2ForCausalLM

    return Gemma2ForCausalLM(hf_config, dtype, attn_backend)


def _opt(hf_config, dtype, attn_backend):
    from minivllm_tpu.models.opt import OPTForCausalLM

    return OPTForCausalLM(hf_config, dtype, attn_backend)


def _gpt2(hf_config, dtype, attn_backend):
    from minivllm_tpu.models.gpt2 import GPT2ForCausalLM

    return GPT2ForCausalLM(hf_config, dtype, attn_backend)


SUPPORTED_MODELS = {
    "Qwen2ForCausalLM": _qwen,
    "Qwen3ForCausalLM": _qwen,
    "LlamaForCausalLM": _qwen,
    "MistralForCausalLM": _qwen,
    "Qwen3MoeForCausalLM": _qwen_moe,
    "MixtralForCausalLM": _mixtral,
    "GemmaForCausalLM": _gemma,
    "Gemma2ForCausalLM": _gemma2,
    "OPTForCausalLM": _opt,
    "GPT2LMHeadModel": _gpt2,
}

TYPE_TO_ARCH = {
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "llama": "LlamaForCausalLM",
    "mistral": "MistralForCausalLM",
    "qwen3_moe": "Qwen3MoeForCausalLM",
    "mixtral": "MixtralForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
    "opt": "OPTForCausalLM",
    "gpt2": "GPT2LMHeadModel",
}


def create_model(hf_config, dtype, attn_backend):
    """Instantiate the model for an HF config (keyed on `architectures`,
    falling back to `model_type`)."""
    archs = getattr(hf_config, "architectures", None) or []
    for arch in archs:
        if arch in SUPPORTED_MODELS:
            return SUPPORTED_MODELS[arch](hf_config, dtype, attn_backend)
    mt = getattr(hf_config, "model_type", None)
    if mt in TYPE_TO_ARCH:
        return SUPPORTED_MODELS[TYPE_TO_ARCH[mt]](hf_config, dtype, attn_backend)
    raise ValueError(
        f"unsupported model: architectures={archs} model_type={mt}; "
        f"supported: {sorted(SUPPORTED_MODELS)}"
    )
