"""BlockManager allocation, prefix caching, and boundary semantics
(reference: tests/test_block_manager.py)."""

import pytest

from minivllm_tpu.engine.block_manager import BlockManager
from minivllm_tpu.engine.sequence import Sequence

BS = 4


def mk_seq(tokens):
    return Sequence(list(tokens), block_size=BS)


def test_allocate_and_deallocate():
    bm = BlockManager(num_blocks=10, block_size=BS)
    seq = mk_seq(range(10))
    assert bm.can_allocate(seq)
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert bm.num_free_blocks == 7
    bm.deallocate(seq)
    assert bm.num_free_blocks == 10
    assert seq.block_table == []


def test_can_allocate_respects_capacity():
    bm = BlockManager(num_blocks=2, block_size=BS)
    assert not bm.can_allocate(mk_seq(range(12)))
    assert bm.can_allocate(mk_seq(range(8)))


def test_prefix_cache_hit():
    bm = BlockManager(num_blocks=10, block_size=BS)
    a = mk_seq(range(10))
    bm.allocate(a)
    b = mk_seq(range(10))
    bm.allocate(b)
    # two full blocks shared, last partial block fresh
    assert b.block_table[:2] == a.block_table[:2]
    assert b.block_table[2] != a.block_table[2]
    assert b.num_cached_tokens == 8
    assert bm.blocks[a.block_table[0]].ref_count == 2
    assert bm.stats["prefix_cache_hits"] == 2


def test_full_hit_recomputes_last_token():
    bm = BlockManager(num_blocks=10, block_size=BS)
    a = mk_seq(range(8))
    bm.allocate(a)
    b = mk_seq(range(8))
    bm.allocate(b)
    # all blocks cached, but at least one token must be recomputed
    assert b.num_cached_tokens == 7
    assert b.block_table == a.block_table


def test_divergent_prefix_no_hit():
    bm = BlockManager(num_blocks=10, block_size=BS)
    a = mk_seq([1, 2, 3, 4, 5, 6, 7, 8])
    bm.allocate(a)
    b = mk_seq([9, 2, 3, 4, 5, 6, 7, 8])  # differs in first token
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    assert set(b.block_table).isdisjoint(set(a.block_table))


def test_resurrection_from_free_list():
    bm = BlockManager(num_blocks=10, block_size=BS)
    a = mk_seq(range(8))
    bm.allocate(a)
    table = list(a.block_table)
    bm.deallocate(a)
    assert bm.num_free_blocks == 10
    b = mk_seq(range(8))
    bm.allocate(b)
    # freed blocks resurrected via tombstoned hashes
    assert b.block_table == table
    assert b.num_cached_tokens == 7


def test_tombstone_invalidated_on_reuse():
    bm = BlockManager(num_blocks=2, block_size=BS)
    a = mk_seq(range(8))
    bm.allocate(a)
    bm.deallocate(a)
    # exhaust all blocks with different content
    b = mk_seq([100 + i for i in range(8)])
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    bm.deallocate(b)
    # original hashes must no longer hit stale blocks
    c = mk_seq(range(8))
    bm.allocate(c)
    assert c.num_cached_tokens in (0, 7)
    # whatever happened, the content recorded must match
    for i, bid in enumerate(c.block_table):
        if bm.blocks[bid].hash != -1:
            assert bm.blocks[bid].token_ids == c.block(i)


def test_may_append_boundary():
    bm = BlockManager(num_blocks=10, block_size=BS)
    seq = mk_seq(range(6))
    bm.allocate(seq)
    assert len(seq.block_table) == 2
    # appending tokens 7, 8 stays in block 1; crossing into 9th token
    # (position 8) opens block 2
    seq.append_token(6)
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert len(seq.block_table) == 2
    seq.append_token(7)
    bm.may_append(seq)
    assert len(seq.block_table) == 2
    seq.append_token(8)  # position 8 -> new block
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert len(seq.block_table) == 3


def test_hash_finalized_on_block_fill():
    bm = BlockManager(num_blocks=10, block_size=BS)
    seq = mk_seq([1, 2, 3])
    bm.allocate(seq)
    b0 = bm.blocks[seq.block_table[0]]
    assert b0.hash == -1  # partial block
    seq.append_token(4)  # fills block 0
    bm.on_token_appended(seq)
    # NOT yet registered: the filling token's KV is only written by the
    # decode step that consumes it — registering now would let a
    # prefix-cache hit read one stale position.
    assert b0.hash == -1
    bm.may_append(seq)
    seq.append_token(5)  # position 4 -> new block; block 0 now KV-complete
    bm.on_token_appended(seq)
    bm.may_append(seq)
    assert b0.hash != -1
    assert b0.token_ids == [1, 2, 3, 4]
    # a new prompt sharing that full prefix now hits
    other = mk_seq([1, 2, 3, 4, 9])
    bm.allocate(other)
    assert other.num_cached_tokens == 4
    assert other.block_table[0] == seq.block_table[0]


def test_can_append_needs_free_block_at_boundary():
    bm = BlockManager(num_blocks=2, block_size=BS)
    seq = mk_seq(range(8))
    bm.allocate(seq)
    assert bm.num_free_blocks == 0
    seq.append_token(8)  # position 8 needs a third block
    assert not bm.can_append(seq)


def test_double_free_raises():
    bm = BlockManager(num_blocks=4, block_size=BS)
    seq = mk_seq(range(4))
    bm.allocate(seq)
    table = list(seq.block_table)
    bm.deallocate(seq)
    seq.block_table = table
    with pytest.raises(RuntimeError):
        bm.deallocate(seq)


def test_prefix_caching_disabled():
    bm = BlockManager(num_blocks=10, block_size=BS, enable_prefix_caching=False)
    a = mk_seq(range(8))
    bm.allocate(a)
    b = mk_seq(range(8))
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    assert set(b.block_table).isdisjoint(set(a.block_table))
