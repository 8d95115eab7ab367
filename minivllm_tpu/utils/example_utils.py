"""Prompt formatting helpers for examples
(reference: /root/reference/minivllm/utils/example_utils.py:16-53)."""

from __future__ import annotations

__all__ = ["format_chat_prompt"]


def format_chat_prompt(tokenizer, user_message: str, system: str | None = None):
    """Apply the model's chat template when available, else pass through."""
    if tokenizer is None:
        return user_message
    messages = []
    if system:
        messages.append({"role": "system", "content": system})
    messages.append({"role": "user", "content": user_message})
    try:
        return tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
    except Exception:
        return user_message
