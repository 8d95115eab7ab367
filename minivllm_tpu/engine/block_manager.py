"""Paged KV-cache block management with hash-based prefix caching.

Counterpart of the reference BlockManager
(/root/reference/minivllm/engine/block_manager.py:24-450). Physical blocks
live in one HBM-resident array managed by the model runner; this class
tracks only the host-side metadata: which physical block holds which
tokens, reference counts for sharing, and the chained-hash index that lets
a new prompt reuse KV blocks computed for an identical prefix.

Key semantics preserved from the reference:
- a block's hash is only finalized when the block is FULL; partial blocks
  have hash -1 and are never shared (block_manager.py:404-450);
- hashes chain: hash(block_i) = H(tokens_i, seed=hash(block_{i-1})), so a
  hit guarantees the entire prefix matches (block_manager.py:128-152);
- freed blocks keep their hash in the index ("lazy tombstone") and may be
  resurrected from the free list on a later hit (block_manager.py:154-164,
  :252-344).
"""

from __future__ import annotations

from collections import deque

from minivllm_tpu.engine.sequence import Sequence
from minivllm_tpu.utils.hashing import hash_token_blocks

__all__ = ["Block", "BlockManager"]


class Block:
    """Metadata for one physical KV block."""

    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int) -> None:
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []

    def update(self, block_hash: int, token_ids: list[int]) -> None:
        self.hash = block_hash
        self.token_ids = token_ids

    def reset(self) -> None:
        self.ref_count = 1
        self.hash = -1
        self.token_ids = []


class BlockManager:
    """Allocates/frees physical KV blocks and serves prefix-cache lookups."""

    def __init__(
        self, num_blocks: int, block_size: int, enable_prefix_caching: bool = True
    ) -> None:
        if num_blocks <= 0:
            raise ValueError(f"num_blocks must be positive, got {num_blocks}")
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self.blocks: list[Block] = [Block(i) for i in range(num_blocks)]
        # hash -> block_id of the most recent block with that chained hash.
        self.hash_to_block_id: dict[int, int] = {}
        # Free block ids in LRU order; blocks stay in the hash index while
        # free ("tombstones") so they can be resurrected on a cache hit.
        self.free_block_ids: deque[int] = deque(range(num_blocks))
        self.used_block_ids: set[int] = set()
        self.stats = {
            "prefix_cache_hits": 0,
            "prefix_cache_queries": 0,
            "allocated_blocks": 0,
            "freed_blocks": 0,
        }

    # -- internal ------------------------------------------------------------

    def _take_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        if block.ref_count != 0:
            raise RuntimeError(f"block {block_id} taken while in use")
        # Evict a stale hash-index entry pointing at this block: its KV is
        # about to be overwritten.
        if block.hash != -1 and self.hash_to_block_id.get(block.hash) == block_id:
            del self.hash_to_block_id[block.hash]
        block.reset()
        self.free_block_ids.remove(block_id)
        self.used_block_ids.add(block_id)
        self.stats["allocated_blocks"] += 1
        return block

    def _release_block(self, block_id: int) -> None:
        block = self.blocks[block_id]
        if block.ref_count != 0:
            raise RuntimeError(f"releasing block {block_id} with refs")
        self.used_block_ids.discard(block_id)
        self.free_block_ids.append(block_id)
        self.stats["freed_blocks"] += 1

    # -- public API ----------------------------------------------------------

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    def can_allocate(self, seq: Sequence) -> bool:
        """Conservative admission test: assume zero cache hits."""
        return seq.num_blocks <= self.num_free_blocks

    def allocate(self, seq: Sequence) -> None:
        """Allocate the full block table for a prompt, reusing cached prefixes.

        Sets seq.num_cached_tokens to the number of leading tokens whose KV
        already exists (always leaving at least one prompt token to compute
        so prefill produces logits for sampling).
        """
        if seq.block_table:
            raise RuntimeError(f"seq {seq.seq_id} already has a block table")
        # Prompt-logprob requests need logits at every prompt position, so
        # no prefix may be skipped via cache hits. Their freshly written
        # full blocks still register hashes below for OTHER requests.
        use_cache = (
            self.enable_prefix_caching
            and seq.sampling_params.prompt_logprobs is None
        )
        block_hashes = (
            hash_token_blocks(seq.token_ids, self.block_size)
            if self.enable_prefix_caching
            else []
        )
        cache_miss = False
        for i in range(seq.num_blocks):
            block_hash = block_hashes[i] if i < len(block_hashes) else -1
            token_ids = seq.block(i)
            hit_id = -1
            if use_cache and block_hash != -1 and not cache_miss:
                self.stats["prefix_cache_queries"] += 1
                hit_id = self.hash_to_block_id.get(block_hash, -1)
                if hit_id != -1 and self.blocks[hit_id].token_ids != token_ids:
                    hit_id = -1  # hash collision
            if hit_id == -1:
                cache_miss = True
                block = self._take_block(self.free_block_ids[0])
                if block_hash != -1:
                    # Full block: finalize its hash now (its KV will be
                    # written this prefill).
                    block.update(block_hash, token_ids)
                    self.hash_to_block_id[block_hash] = block.block_id
                seq.block_table.append(block.block_id)
            else:
                self.stats["prefix_cache_hits"] += 1
                seq.num_cached_tokens += self.block_size
                block = self.blocks[hit_id]
                if block.ref_count > 0:
                    block.ref_count += 1
                else:
                    # Resurrect from the free list.
                    self.free_block_ids.remove(hit_id)
                    self.used_block_ids.add(hit_id)
                    block.ref_count = 1
                seq.block_table.append(hit_id)
        # Always compute at least the final prompt token so prefill emits
        # logits for this sequence.
        if seq.num_cached_tokens >= len(seq):
            seq.num_cached_tokens = len(seq) - 1

    def shared_fork_blocks(self, parent: Sequence, child: Sequence) -> int:
        """Blocks of `parent`'s table that `child` can share at fork:
        the FULL blocks covering the (identical) prompt. The partial
        tail block diverges on the first generated token and is never
        shared (reference refcount semantics:
        /root/reference/minivllm/engine/block_manager.py:346-364).
        0 when the parent's table is gone (preempted/finished) or its
        prompt KV is not computed yet."""
        shared = child.num_prompt_tokens // self.block_size
        if (
            parent.block_table is None
            or len(parent.block_table) < shared
            or parent.num_computed_tokens < shared * self.block_size
        ):
            return 0
        return shared

    def can_fork(self, parent: Sequence, child: Sequence) -> bool:
        shared = self.shared_fork_blocks(parent, child)
        return child.num_blocks - shared <= self.num_free_blocks

    def fork(self, parent: Sequence, child: Sequence) -> None:
        """Copy-on-write fork: child's table references the parent's
        full prompt blocks (refcount++, no KV copy, no hashing), fresh
        blocks cover the tail. child.num_cached_tokens marks the shared
        prefix so prefill recomputes only the partial tail (at most
        block_size tokens; the divergence point). If the prompt is
        block-aligned the child still recomputes its final prompt token,
        rewriting that shared slot with identical values (the same
        benign rewrite speculative verification performs)."""
        if child.block_table:
            raise RuntimeError(f"seq {child.seq_id} already has a block table")
        shared = self.shared_fork_blocks(parent, child)
        if shared == 0:
            return self.allocate(child)
        for block_id in parent.block_table[:shared]:
            block = self.blocks[block_id]
            if block.ref_count <= 0:
                raise RuntimeError(f"forking freed block {block_id}")
            block.ref_count += 1
            child.block_table.append(block_id)
        child.num_cached_tokens = min(
            shared * self.block_size, len(child) - 1
        )
        for i in range(shared, child.num_blocks):
            block = self._take_block(self.free_block_ids[0])
            child.block_table.append(block.block_id)

    def deallocate(self, seq: Sequence) -> None:
        """Drop all references to the sequence's blocks (freed blocks keep
        their hash in the index for resurrection)."""
        for block_id in reversed(seq.block_table):
            block = self.blocks[block_id]
            if block.ref_count <= 0:
                raise RuntimeError(f"double free of block {block_id}")
            block.ref_count -= 1
            if block.ref_count == 0:
                self._release_block(block_id)
        seq.block_table = []
        seq.num_cached_tokens = 0

    def _blocks_needed(self, seq: Sequence, lookahead: int) -> int:
        """Blocks to add so positions [len-1, len-1+lookahead) have slots.

        At decode-schedule time the sequence already holds the token sampled
        last step (index len-1); its KV is written this step, and a
        multi-step dispatch writes `lookahead` consecutive positions.
        """
        last_pos = len(seq) - 2 + lookahead
        return max(0, last_pos // self.block_size + 1 - len(seq.block_table))

    def can_append(self, seq: Sequence, lookahead: int = 1) -> bool:
        """True if the next `lookahead` decode positions can get slots."""
        return self.num_free_blocks >= self._blocks_needed(seq, lookahead)

    def may_append(self, seq: Sequence, lookahead: int = 1) -> None:
        """Allocate blocks for the next `lookahead` decode positions.

        Hash finalization of freshly filled blocks happens separately at
        token-append time (on_token_appended) — with lookahead allocation a
        block may exist before its tokens do.
        """
        if not seq.block_table:
            raise RuntimeError("may_append before allocate")
        for _ in range(self._blocks_needed(seq, lookahead)):
            block = self._take_block(self.free_block_ids[0])
            seq.block_table.append(block.block_id)

    def on_token_appended(self, seq: Sequence) -> None:
        """Called after each real token append; finalizes the hash of a
        full block ONE TOKEN AFTER it fills (reference registers at fill
        time, block_manager.py:404-450 — racy, see below).

        A decode step writes the KV of the token it CONSUMES, so
        position p's KV is on device only once len(seq) >= p + 2.
        Registering a block the moment it fills (len % bs == 0) exposes
        its last position to prefix-cache hits scheduled before the
        owner's next step, which would read stale KV. Deferring to
        len % bs == 1 restores the invariant (device KV valid through
        len - 2 >= the block's last position). The same invariant is
        what makes speculative verification safe: accepted draft rows
        are KV-correct and the bonus token's row is rewritten by the
        step that consumes it."""
        if not self.enable_prefix_caching:
            return
        if len(seq) % self.block_size == 1:
            self._finalize_full_block(seq, len(seq) // self.block_size - 1)

    def _finalize_full_block(self, seq: Sequence, logical_idx: int) -> None:
        if logical_idx < 0:
            return
        block = self.blocks[seq.block_table[logical_idx]]
        if block.hash != -1:
            return  # shared/cached block, already finalized
        prefix = 0
        if logical_idx > 0:
            prev = self.blocks[seq.block_table[logical_idx - 1]]
            prefix = prev.hash if prev.hash != -1 else 0
        hashes = hash_token_blocks(seq.block(logical_idx), self.block_size, prefix)
        if hashes:
            block.update(hashes[0], seq.block(logical_idx))
            self.hash_to_block_id[hashes[0]] = block.block_id

    @property
    def prefix_cache_hit_rate(self) -> float:
        q = self.stats["prefix_cache_queries"]
        return self.stats["prefix_cache_hits"] / q if q else 0.0
