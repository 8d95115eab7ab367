"""N-gram (prompt-lookup) speculative decoding — the host-side proposer.

Technique (public; "prompt lookup decoding", also in HF transformers'
`prompt_lookup_num_tokens`): generated text often repeats spans of its
own prompt/history (code, extraction, quoting). At each decode step,
find the most recent EARLIER occurrence of the sequence's trailing
n-gram; the tokens that followed it become draft tokens, verified in a
single model pass (model_runner.run_verify). Greedy acceptance keeps
the emitted tokens bit-identical to plain greedy decoding: a draft
token is accepted only when it equals the model's argmax at its
position, and the first mismatch position contributes the model's own
token (the "bonus") instead.

The reference has no speculative decoding (SURVEY.md §2) — this is a
beyond-parity serving feature. No draft model is involved, so there is
nothing to load or keep in HBM.
"""

from __future__ import annotations

__all__ = ["propose_ngram"]


def propose_ngram(
    token_ids: list[int],
    ngram: int,
    max_draft: int,
    window: int = 1024,
) -> list[int]:
    """Draft tokens following the most recent earlier occurrence of the
    trailing `ngram` tokens. Empty when there is no earlier occurrence
    (or the sequence is shorter than the n-gram).

    `window` bounds the backward scan so the per-step host cost stays
    O(window) for very long sequences.
    """
    L = len(token_ids)
    if max_draft <= 0 or L <= ngram:
        return []
    tail = token_ids[L - ngram:]
    lo = max(0, L - ngram - window)
    # Most recent occurrence wins: locality makes continuation likelier.
    for start in range(L - ngram - 1, lo - 1, -1):
        if token_ids[start:start + ngram] == tail:
            cont = token_ids[start + ngram:start + ngram + max_draft]
            return list(cont)
    return []
