from minivllm_tpu.sampling.ops import SamplingState, sample_tokens

__all__ = ["SamplingState", "sample_tokens"]
