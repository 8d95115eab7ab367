from minivllm_tpu.engine.block_manager import Block, BlockManager
from minivllm_tpu.engine.scheduler import Scheduler
from minivllm_tpu.engine.sequence import Sequence, SequenceStatus

__all__ = ["Block", "BlockManager", "Scheduler", "Sequence", "SequenceStatus"]
