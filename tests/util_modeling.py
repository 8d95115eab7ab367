"""Shared helpers for model parity tests: metadata construction for a
simple fresh-prefill batch + decode continuation."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from minivllm_tpu.ops.attention import DecodeBatch, PrefillBatch


def build_prefill_batch(token_lists, block_size, num_blocks, pad_t=None, pad_c=None):
    """Metadata for prefilling fresh sequences (no cached prefix), blocks
    allocated contiguously in order. Returns (meta, block_tables_np)."""
    S = len(token_lists)
    lens = [len(t) for t in token_lists]
    T = sum(lens)
    pad_t = pad_t or T
    pad_c = pad_c or T
    trash_slot = num_blocks * block_size
    trash_block = num_blocks
    input_ids, positions, q_seg, slots = [], [], [], []
    last_idx = []
    W = max((L + block_size - 1) // block_size for L in lens)
    block_tables = np.full((S, W), trash_block, np.int32)
    next_block = 0
    for s, toks in enumerate(token_lists):
        L = len(toks)
        nb = (L + block_size - 1) // block_size
        blocks = list(range(next_block, next_block + nb))
        next_block += nb
        block_tables[s, :nb] = blocks
        input_ids += list(toks)
        positions += list(range(L))
        q_seg += [s] * L
        slots += [blocks[i // block_size] * block_size + i % block_size for i in range(L)]
        last_idx.append(len(input_ids) - 1)
    def pad(arr, n, fill):
        return np.asarray(arr + [fill] * (n - len(arr)), np.int32)
    q_start = np.zeros(S, np.int32)
    ofs = 0
    for s, L in enumerate(lens):
        q_start[s] = ofs
        ofs += L
    meta = PrefillBatch(
        input_ids=jnp.asarray(pad(input_ids, pad_t, 0)),
        positions=jnp.asarray(pad(positions, pad_t, 0)),
        q_seg=jnp.asarray(pad(q_seg, pad_t, -1)),
        slot_mapping=jnp.asarray(pad(slots, pad_t, trash_slot)),
        ctx_slot_mapping=jnp.asarray(pad(slots, pad_c, trash_slot)),
        k_seg=jnp.asarray(pad(q_seg, pad_c, -2)),
        k_pos=jnp.asarray(pad(positions, pad_c, 0)),
        last_token_idx=jnp.asarray(np.array(last_idx, np.int32)),
        block_tables=jnp.asarray(block_tables),
        ctx_lens=jnp.asarray(np.array(lens, np.int32)),
        q_start=jnp.asarray(q_start),
        q_lens=jnp.asarray(np.array(lens, np.int32)),
    )
    return meta, block_tables


def build_decode_batch(token_lists, block_tables, block_size, num_blocks):
    """Decode metadata: last token of each sequence is the input; context =
    all tokens. token_lists include the new token at the end. Grows block
    tables (allocating fresh contiguous blocks) when a sequence crosses a
    block boundary, like the real block manager."""
    S = len(token_lists)
    trash_block = num_blocks
    trash_slot = num_blocks * block_size
    lens = np.array([len(t) for t in token_lists], np.int32)
    # Grow tables if any sequence needs more blocks.
    need = int(max((lens + block_size - 1) // block_size))
    if need > block_tables.shape[1]:
        pad = np.full((S, need - block_tables.shape[1]), trash_block, np.int32)
        block_tables = np.concatenate([block_tables, pad], axis=1)
    next_block = int(block_tables[block_tables != trash_block].max()) + 1
    for s in range(S):
        nb = (lens[s] + block_size - 1) // block_size
        for j in range(need):
            if j < nb and block_tables[s, j] == trash_block:
                block_tables[s, j] = next_block
                next_block += 1
    input_ids = np.array([t[-1] for t in token_lists], np.int32)
    positions = lens - 1
    slots = np.array(
        [
            block_tables[s, (lens[s] - 1) // block_size] * block_size
            + (lens[s] - 1) % block_size
            for s in range(S)
        ],
        np.int32,
    )
    meta = DecodeBatch(
        input_ids=jnp.asarray(input_ids),
        positions=jnp.asarray(positions),
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(block_tables),
        ctx_lens=jnp.asarray(lens),
    )
    return meta, block_tables
